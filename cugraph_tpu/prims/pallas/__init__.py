from .spmv import PullLayout, build_pull_layout, pull_spmv, pallas_spmv_available
