from .text import doc_stats, lang_id, tokens
from .vectors import cosine_similarity, l2_norm

__all__ = ["cosine_similarity", "doc_stats", "l2_norm", "lang_id", "tokens"]
