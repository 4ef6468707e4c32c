from .extract import extract_text, extract_text_udf, guess_lang, guess_lang_udf  # noqa: F401
from .text import (  # noqa: F401
    bpe_token_count,
    punct_ratio,
    quality_score,
    rolling_fingerprints,
    stopword_ratio,
    ws_token_count,
)
from .multimodal import extract_features, synthesize_media  # noqa: F401
from .profile import profile_table  # noqa: F401
