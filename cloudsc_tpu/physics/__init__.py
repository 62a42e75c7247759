from .cloudsc import cloudsc, make_inputs, CloudscOutputs

__all__ = ["cloudsc", "make_inputs", "CloudscOutputs"]
