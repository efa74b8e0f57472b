from .tsv_corpus import load_tsv_corpus  # noqa: F401
