from . import (
    link_analysis,
    centrality,
    traversal,
    components,
    cores,
    community,
    link_prediction,
    tree,
    linear_assignment,
    layout,
)
