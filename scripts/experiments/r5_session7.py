"""Round-5 TPU session 7 — capability extensions: 1.5B at B=16 (does
aggregate throughput keep climbing past the 201.5 B=8 best?) and 7B at B=2
(two full-32K int8-KV streams ≈ 7.6 GB cache + ~4 GB int4f weights on one
16 GB chip — fits on paper; measure it)."""
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


section("rowlane_ab.py", ["16", "int4f"])
section("probe_7b_one_chip.py", [],
        env={"W": "int4f", "TOK": "int4k", "KV": "int8", "FS": "1",
             "CTX": "32768", "STEPS": "5", "ALGO": "sde-dpmsolver++",
             "DH": "int4k", "B": "2"})
print("### session7 complete", flush=True)
