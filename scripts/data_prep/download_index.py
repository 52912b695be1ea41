"""Download Atlas's precomputed 128-shard wiki-dec2018 indices
(reference: get_data/preprocessing/download_index.py). Convert the result
for this framework with::

    python -c "from jsa_rag_tpu.index.atlas_io import convert_atlas_index; \
               convert_atlas_index('<download dir>', '<index dir>')"

or load it directly into a live index via
``jsa_rag_tpu.index.atlas_io.load_atlas_into_index``.

Requires network egress; offline it fails with a clear URLError.
"""

from __future__ import annotations

import argparse

from download_tools import get_download_path, get_s3_path, maybe_download_file

PASSAGE_FNAME = "passages.{shard}.pt"
EMBEDDING_FNAME = "embeddings.{shard}.pt"
N_SHARDS = 128

AVAILABLE_INDICES = [
    {"index": f"indices/{family}/wiki/{size}",
     "description": f"Precomputed wiki-dec2018 index for the "
                    f"{desc} {size} model"}
    for family, desc in [("atlas", "pretrained atlas"),
                         ("atlas_nq", "natural-questions-finetuned atlas")]
    for size in ["xxl", "xl", "large", "base"]
]


def _helpstr() -> str:
    s = "The following indices are available for download: "
    for m in AVAILABLE_INDICES:
        s += f'\nIndex name: {m["index"]:<30} Description: {m["description"]}'
    s += "\nDownload by passing --index {index name}"
    return s


def main(output_directory: str, requested_index: str) -> None:
    for shard in range(N_SHARDS):
        for fname in (PASSAGE_FNAME, EMBEDDING_FNAME):
            rel = f"{requested_index}/{fname.format(shard=shard)}"
            maybe_download_file(get_s3_path(rel),
                                get_download_path(output_directory, rel))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("--output_directory", type=str, default="./data",
                        help="directory the shards are written under")
    parser.add_argument("--index", type=str,
                        choices=[m["index"] for m in AVAILABLE_INDICES],
                        help=_helpstr())
    args = parser.parse_args()
    main(args.output_directory, args.index)
