from .intersect import Hit, intersect_brute, moller_trumbore  # noqa: F401
