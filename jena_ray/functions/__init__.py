"""User-extension surface: registries for functions, aggregates,
datatypes, formats, and pipeline interposition (SURVEY §2.11)."""

from .registry import (
    FUNCTIONS,
    AggregateRegistry,
    DatatypeRegistry,
    FormatRegistry,
    FunctionRegistry,
    PipelineSteps,
)

__all__ = [
    "FUNCTIONS",
    "AggregateRegistry",
    "DatatypeRegistry",
    "FormatRegistry",
    "FunctionRegistry",
    "PipelineSteps",
]
