"""Download pretrained Atlas model checkpoints from fbaipublicfiles
(reference: get_data/preprocessing/download_model.py). Retriever towers in
the downloaded ``model.pth.tar`` can be imported with
``jsa_rag_tpu.index.atlas_io.import_atlas_retriever_towers``.

Requires network egress; offline it fails with a clear URLError.
"""

from __future__ import annotations

import argparse

from download_tools import get_download_path, get_s3_path, maybe_download_file

MODEL_FILE_NAME = "model.pth.tar"

AVAILABLE_MODELS = [
    {"model": "models/atlas/xxl", "description": "Pretrained Atlas XXL model"},
    {"model": "models/atlas/xl", "description": "Pretrained Atlas XL model"},
    {"model": "models/atlas/large", "description": "Pretrained Atlas Large model"},
    {"model": "models/atlas/base", "description": "Pretrained Atlas Base model"},
    {"model": "models/atlas_nq/xxl",
     "description": "Atlas XXL model, finetuned on Natural Questions"},
    {"model": "models/atlas_nq/xl",
     "description": "Atlas XL model, finetuned on Natural Questions"},
    {"model": "models/atlas_nq/large",
     "description": "Atlas large model, finetuned on Natural Questions"},
    {"model": "models/atlas_nq/base",
     "description": "Atlas base model, finetuned on Natural Questions"},
]


def _helpstr() -> str:
    s = "The following models are available for download: "
    for m in AVAILABLE_MODELS:
        s += f'\nModel name: {m["model"]:<30} Description: {m["description"]}'
    s += "\ndownload by passing --model {model name}"
    return s


def main(output_directory: str, requested_model: str) -> None:
    model_path = f"{requested_model}/{MODEL_FILE_NAME}"
    maybe_download_file(get_s3_path(model_path),
                        get_download_path(output_directory, model_path))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("--output_directory", type=str, default="./data",
                        help="directory the model is written under")
    parser.add_argument("--model", type=str,
                        choices=[m["model"] for m in AVAILABLE_MODELS],
                        help=_helpstr())
    args = parser.parse_args()
    main(args.output_directory, args.model)
