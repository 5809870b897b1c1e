from .module import Module
from .pytree import DictPyTree, Static, is_dynamic, register_dynamic_base

__all__ = ["DictPyTree", "Module", "Static", "is_dynamic", "register_dynamic_base"]
