"""Poll the axon TPU tunnel until a trivial jit executes; exit 0 when up.

Dev-only helper (not part of the package): the tunnel can be down for
long stretches (see .claude/skills/verify round-3 notes) — run this in
the background and queue CPU work meanwhile.
"""
import subprocess
import sys
import time

CODE = ("import jax, jax.numpy as jnp; "
        "jax.jit(lambda x: x*2)(jnp.ones(4)); print('TPU_UP')")

deadline = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1 else 3300.0)
while time.time() < deadline:
    try:
        r = subprocess.run([sys.executable, "-c", CODE], capture_output=True,
                           text=True, timeout=180)
        if "TPU_UP" in r.stdout:
            print("TPU_UP", flush=True)
            sys.exit(0)
    except subprocess.TimeoutExpired:
        pass
    print("down; retrying", flush=True)
    time.sleep(60)
print("TPU_STILL_DOWN", flush=True)
sys.exit(1)
