from .modes import concat_loss, rag_loss, vrag_loss, jsa_loss, ApplyFns  # noqa: F401
