from .synthetic import synthetic_users  # noqa: F401
