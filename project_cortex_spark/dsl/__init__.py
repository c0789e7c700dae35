from .compiler import compile_query
from .model import QueryDefinition
from .validator import QueryValidationError, validate_query

__all__ = [
    "QueryDefinition",
    "QueryValidationError",
    "compile_query",
    "validate_query",
]
