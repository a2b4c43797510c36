from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.solvers.parametric import (  # noqa: F401
    CookieMap,
    prepare_cookie_problem,
    prepare_synthetic_cookie_problem,
)
from tt_sketch_tpu.solvers.tt_gmres import (  # noqa: F401
    MPO,
    TTLinearMap,
    TTLinearMapSum,
    TTPrecond,
    round_tt_sum,
    tt_sum_gmres,
)
from tt_sketch_tpu.solvers.tt_svd import tt_svd  # noqa: F401
