from .inspect import formatted_plan  # noqa: F401
