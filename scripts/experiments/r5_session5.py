"""Round-5 TPU session 5 — 7B one-chip at the PRODUCTION solver config
(5-step sde-dpmsolver++; sessions 1-4 probes ran the 10-step CLI default),
with and without the fused int4 diffusion-head kernel, then the continuous
90-minute single-generation run (VERDICT #10)."""
import gc
import os
import runpy
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def section(name, argv, env=None):
    print(f"\n### {name} argv={argv} env={env} t={time.strftime('%H:%M:%S')}",
          flush=True)
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    sys.argv = [os.path.join(HERE, name)] + argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(os.path.join(HERE, name), run_name="__main__")
    except Exception as e:
        print(f"### {name} FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(f"### {name} done in {time.perf_counter()-t0:.0f}s", flush=True)
    gc.collect()


PROD = {"W": "int4f", "TOK": "int4k", "KV": "int8", "FS": "1",
        "CTX": "32768", "STEPS": "5", "ALGO": "sde-dpmsolver++"}
section("probe_7b_one_chip.py", [], env=PROD)
section("probe_7b_one_chip.py", [], env=dict(PROD, DH="int4k"))
section("long_run_90min.py", [])
print("### session5 complete", flush=True)
