from .extract import extract_text, extract_text_udf, guess_lang, guess_lang_udf  # noqa: F401
