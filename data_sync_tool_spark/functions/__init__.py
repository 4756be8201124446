from . import hashes, text, vectors  # noqa: F401
