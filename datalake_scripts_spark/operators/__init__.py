from .nested import flatten, explode_into, normalize, ChildSpec, NormalizeSpec  # noqa: F401
