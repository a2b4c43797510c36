"""Dev helper: force CPU platform before running a snippet (axon tunnel is
single-client and slow for f64 dev work). Usage: python devrun.py script.py
or python devrun.py -c "code"."""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if sys.argv[1] == "-c":
    exec(sys.argv[2])
else:
    exec(open(sys.argv[1]).read())
