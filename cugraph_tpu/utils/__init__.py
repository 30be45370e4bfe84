from .error import GraphError, expects
from . import dtypes
