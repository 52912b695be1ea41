from .bert import BertConfig, bert_init, bert_encode  # noqa: F401
from .retriever import (  # noqa: F401
    RetrieverConfig,
    DualEncoderRetriever,
)
