from .graph import FetchError, SiteGraph, SiteSpec, DIALECTS  # noqa: F401
