from .resource_filter import ResourceFilter, ResourceFilterParseError  # noqa: F401
