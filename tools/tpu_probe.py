"""Tiny TPU health probe: init backend, compile one trivial program, time it.

Run under `timeout` in a subprocess — the axon tunnel can hang for 15-45 min
when wedged (CLAUDE.md), so never run this in-process.
"""
import time

t0 = time.time()
import jax
import jax.numpy as jnp

devs = jax.devices()
t1 = time.time()
print(f"backend init: {t1 - t0:.1f}s devices={devs}", flush=True)

x = jnp.ones((256, 256), jnp.bfloat16)
f = jax.jit(lambda a: (a @ a).sum())
v = float(f(x))
t2 = time.time()
print(f"compile+run: {t2 - t1:.1f}s value={v}", flush=True)
print("PROBE_OK", flush=True)
