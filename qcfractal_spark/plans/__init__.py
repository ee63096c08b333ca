from .filters import QueryFilters, apply_filters, keyset_page
from .projection import apply_projection

__all__ = ["QueryFilters", "apply_filters", "keyset_page", "apply_projection"]
