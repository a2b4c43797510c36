"""Multi-process distributed sketching: 2 processes × 2 CPU devices each.

Proves the cross-host composition VERDICT flagged as missing: the sharded
sparse sketch over a mesh spanning two *processes* (psum rides the
inter-process collective path) equals the single-process sketch exactly.
The reference has no analog (single-process NumPy); this is the
``jax.distributed`` story of SURVEY.md §2.3/§5.
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["TT_REPO"])
import numpy as np
from tt_sketch_tpu.dist import initialize_multihost, global_mesh
from tt_sketch_tpu.dist import sharded_sparse_stream_sketch
from tt_sketch_tpu.formats import SparseTensor
import jax
import jax.numpy as jnp

initialize_multihost()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = global_mesh(("data",))

shape = (6, 5, 4, 6)
rng = np.random.default_rng(0)
nnz = 64
X = SparseTensor(
    shape,
    np.stack([rng.integers(0, s, nnz) for s in shape]),
    rng.standard_normal(nnz),
)
sk = sharded_sparse_stream_sketch(
    X, left_rank=(4, 4, 4), right_rank=(8, 8, 8), seed=42, mesh=mesh,
    data_axis="data", dtype=jnp.float64,
)
if jax.process_index() == 0:
    np.savez(
        os.environ["TT_OUT"],
        **{f"psi{i}": np.asarray(P) for i, P in enumerate(sk.Psi_cores)},
        **{f"omega{i}": np.asarray(O) for i, O in enumerate(sk.Omega_mats)},
    )
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sparse_sketch_matches_single():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out = os.path.join(tempfile.mkdtemp(), "multihost_sketch.npz")

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_ENABLE_X64="1",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            TT_SKETCH_TPU_COORDINATOR=f"127.0.0.1:{port}",
            TT_SKETCH_TPU_NUM_PROCESSES="2",
            TT_SKETCH_TPU_PROCESS_ID=str(pid),
            TT_REPO=repo,
            TT_OUT=out,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                cwd=repo,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    got = np.load(out)

    # single-process reference on the in-process mesh
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tt_sketch_tpu.dist import sharded_sparse_stream_sketch
    from tt_sketch_tpu.formats import SparseTensor

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shape = (6, 5, 4, 6)
    rng = np.random.default_rng(0)
    nnz = 64
    X = SparseTensor(
        shape,
        np.stack([rng.integers(0, s, nnz) for s in shape]),
        rng.standard_normal(nnz),
    )
    ref = sharded_sparse_stream_sketch(
        X, left_rank=(4, 4, 4), right_rank=(8, 8, 8), seed=42, mesh=mesh,
        data_axis="data", dtype=jnp.float64,
    )
    for i, P in enumerate(ref.Psi_cores):
        np.testing.assert_allclose(
            got[f"psi{i}"], np.asarray(P), atol=1e-13
        )
    for i, O in enumerate(ref.Omega_mats):
        np.testing.assert_allclose(
            got[f"omega{i}"], np.asarray(O), atol=1e-13
        )
