from .vectors import cosine, dot, l2norm
from .text import tokens, md5_int32

__all__ = ["cosine", "dot", "l2norm", "tokens", "md5_int32"]
