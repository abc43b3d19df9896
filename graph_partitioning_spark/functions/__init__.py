from .extraction import extract_text_udf, extract_links_udf  # noqa: F401
