from .mips import mips_topk, mips_topk_exact, mips_topk_approx  # noqa: F401
