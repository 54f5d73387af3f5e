"""Round-5 TPU session 6 — dh4 (fused int4 solver-head) A/B at the 1.5B
composed configs (it pays +10% at 7B; re-check 1.5B), B=1 and B=8."""
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


section("dh4_ab.py", ["1", "int4f"])
section("dh4_ab.py", ["8", "int4f"])
print("### session6 complete", flush=True)
