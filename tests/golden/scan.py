"""Golden-test coverage scanner: attempts every tractable reference test
and writes a pass/fail/unsupported census to /tmp/golden_scan.json.

Usage: python -m tests.golden.scan [first_n | dir ...]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import traceback

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from .phpser import load_model  # noqa: E402
from .runner import GoldenUnsupported, run_subtest  # noqa: E402
from .testcase import TESTROOT, load_test  # noqa: E402


def candidates() -> list[str]:
    out = []
    for d in sorted(os.listdir(TESTROOT)):
        if not d.startswith("test_"):
            continue
        path = os.path.join(TESTROOT, d, "test.xml")
        if not os.path.isfile(path):
            continue
        out.append(d)
    return out


def scan_one(dirname: str, time_budget: float = 120.0) -> dict:
    import time
    t0 = time.time()
    try:
        gt = load_test(dirname)
    except Exception as e:
        return {"status": "loaderror", "detail": f"{type(e).__name__}: {e}"}

    try:
        model = load_model(os.path.join(TESTROOT, dirname, "model.bin"))
    except Exception as e:
        return {"status": "modelerror",
                "detail": f"{type(e).__name__}: {e}"}
    n = min(gt.n_subtests, len(model))
    fails: list[str] = []
    ran = 0
    try:
        with tempfile.TemporaryDirectory() as td:
            for st in range(n):
                if time.time() - t0 > time_budget:
                    return {"status": "timeout",
                            "detail": f"{ran}/{n} subtests in budget"}
                if gt.has_custom:
                    from .phpcustom import run_custom_subtest
                    f = run_custom_subtest(gt, st, model[st], td)
                else:
                    f = run_subtest(gt, st, model[st], td)
                ran += 1
                fails.extend(f"[st{st}] {x}" for x in f)
    except GoldenUnsupported as e:
        return {"status": "unsupported", "detail": str(e)}
    except NotImplementedError as e:
        return {"status": "unsupported", "detail": f"NIE: {e}"}
    except Exception as e:
        return {"status": "error",
                "detail": "".join(traceback.format_exception_only(
                    type(e), e)).strip()[:300]}
    if fails:
        return {"status": "fail", "detail": f"{len(fails)} query diffs",
                "fails": fails[:6]}
    return {"status": "pass", "detail": f"{ran} subtests"}


def main():
    args = sys.argv[1:]
    dirs = candidates()
    if args and args[0].isdigit():
        dirs = dirs[:int(args[0])]
    elif args:
        dirs = args
    results = {}
    counts: dict[str, int] = {}
    for d in dirs:
        r = scan_one(d)
        # bound the mmap count: each live XLA:CPU executable pins ~3
        # maps; an unbounded scan crosses vm.max_map_count and LLVM
        # compiles start failing with "Cannot allocate memory"
        jax.clear_caches()
        results[d] = r
        counts[r["status"]] = counts.get(r["status"], 0) + 1
        print(f"{d}: {r['status']} — {r['detail']}", flush=True)
        with open(os.environ.get("GOLDEN_SCAN_OUT",
          "/tmp/golden_scan.json"), "w") as f:
            json.dump({"counts": counts, "results": results}, f, indent=1)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
