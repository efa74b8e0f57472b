from .model import GoldenIndex, GoldenQueryEngine  # noqa: F401
