from ocr_spark.functions.text import hex60, norm_tokens, shingles3
from ocr_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["hex60", "norm_tokens", "shingles3", "cosine_similarity", "dot", "l2_norm"]
