from . import codes_csv, tables  # noqa: F401
