from .adapters import parse_page, ADAPTERS  # noqa: F401
