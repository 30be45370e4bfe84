"""Error handling.

TPU-native analog of the reference's CUGRAPH_EXPECTS / CUGRAPH_FAIL macros
(reference: cpp/include/cugraph/utilities/error.hpp:44,60) — plain Python
exceptions with clean propagation; no device-side aborts.
"""


class GraphError(RuntimeError):
    """Framework logic error (analog of cugraph::logic_error)."""


def expects(cond: bool, msg: str) -> None:
    if not cond:
        raise GraphError(msg)
