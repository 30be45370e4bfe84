from .reduce_ops import ReduceOp, PLUS, MINIMUM, MAXIMUM, ANY, LOGICAL_OR
from .per_v import (
    per_v_transform_reduce_incoming_e,
    per_v_transform_reduce_outgoing_e,
)
from .transform_e import (
    transform_reduce_e,
    count_if_e,
    transform_e,
    extract_if_e,
)
from .vertex import (
    transform_reduce_v,
    reduce_v,
    count_if_v,
)
from .frontier import (
    transform_reduce_v_frontier_outgoing_e_by_dst,
    update_v_frontier,
)
from .keyed import (
    transform_reduce_e_by_src_key,
    transform_reduce_e_by_dst_key,
    aggregate_outgoing_e_by_dst_key,
    per_v_transform_reduce_dst_key_aggregated_outgoing_e,
)
from .random_select import per_v_random_select_outgoing_e
from .intersection import (
    per_v_pair_dst_nbr_intersection,
    triangle_counts_per_vertex,
)
