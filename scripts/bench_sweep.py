"""Cost attribution through the ONLY reliable probe on the axon tunnel:
the full bench loop. Sweeps QP config knobs and reports the period delta
vs production. (Microbenchmark timing of isolated executables is
unreliable through the relay — see profile_kernel_phases.py history.)
"""
import json
import sys

from bench import bench
from rl_mpc_locomotion_tpu.ops.qp import production_qp_config

prod = production_qp_config()
variants = {
    "prod": prod,
    "iters1": prod._replace(iters=1),
    "ruiz0": prod._replace(ruiz_iters=0),
    "ruiz1": prod._replace(ruiz_iters=1),
    "norho": prod._replace(deferred_rho=False),
}
which = sys.argv[1:] or list(variants)
out = {}
for name in which:
    r = bench(batch=4096, qp_cfg=variants[name])
    out[name] = r["detail"]["mpc_period_ms"]
    print(name, out[name], flush=True)
print(json.dumps(out))
