from .subjects import subject_match, subject_to_regex  # noqa: F401
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
