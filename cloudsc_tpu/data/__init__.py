from .io import (
    load_input,
    load_reference,
    write_h5,
    InputData,
    REFERENCE_FIELDS,
    default_input_path,
    default_reference_path,
)
from .expand import expand_field, get_offsets

__all__ = [
    "load_input",
    "load_reference",
    "write_h5",
    "InputData",
    "REFERENCE_FIELDS",
    "default_input_path",
    "default_reference_path",
    "expand_field",
    "get_offsets",
]
