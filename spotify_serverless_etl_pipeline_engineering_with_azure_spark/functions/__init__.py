from . import dates, exact, hashing  # noqa: F401
