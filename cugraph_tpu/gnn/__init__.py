from .aggregators import spmm_aggregate, gcn_aggregate, sage_aggregate
from .models import GraphSAGE, GCN
from .graph_store import GraphStore, FeatureStorage
from .loader import NeighborLoader, LinkNeighborLoader, SampledBlock
from .pyg_store import PyGStore, EdgeAttr, TensorAttr, EdgeLayout, to_pyg
