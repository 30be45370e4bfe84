from .server import CugraphHandler, CugraphTpuServer
from .client import CugraphTpuClient
from .exceptions import CugraphServiceError
