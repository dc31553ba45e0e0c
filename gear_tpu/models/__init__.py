from . import llama  # noqa: F401
from .llama import ModelConfig  # noqa: F401
