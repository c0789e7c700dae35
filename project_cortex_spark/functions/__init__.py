from .vector import cosine_distance, cosine_similarity, dot_product, l2_norm, l2_normalize, similarity_score

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "similarity_score",
]
