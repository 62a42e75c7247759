from .io import (
    load_input,
    load_reference,
    write_h5,
    InputData,
    REFERENCE_FIELDS,
)
from .expand import expand_field, get_offsets

__all__ = [
    "load_input",
    "load_reference",
    "write_h5",
    "InputData",
    "REFERENCE_FIELDS",
    "expand_field",
    "get_offsets",
]
