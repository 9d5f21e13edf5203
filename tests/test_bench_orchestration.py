"""bench.py parent-side orchestration: child-line collection and deadline
behavior (pure host logic — no jax, no TPU).

The official driver artifact depends on this plumbing: a child that dies or
overruns must still contribute every line it completed, and the parent must
never lose the budget to a hung child."""
import json
import sys
import time


def _load_bench():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_child_collects_json_lines():
    bench = _load_bench()
    code = (
        "import json\n"
        "print('noise line')\n"
        "print(json.dumps({'k': 'a', 'v': 1.5}), flush=True)\n"
        "print(json.dumps({'k': 'b', 'v': 2.5, 'wall_s': 0.1}), flush=True)\n"
    )
    lines = bench._run_child([sys.executable, "-c", code], 30.0, "t_ok")
    assert {d["k"] for d in lines} == {"a", "b"}


def test_run_child_deadline_keeps_partial_output():
    bench = _load_bench()
    code = (
        "import json, time\n"
        "print(json.dumps({'k': 'early', 'v': 1}), flush=True)\n"
        "time.sleep(300)\n"
        "print(json.dumps({'k': 'late', 'v': 2}), flush=True)\n"
    )
    t0 = time.monotonic()
    lines = bench._run_child([sys.executable, "-c", code], 3.0, "t_slow")
    assert time.monotonic() - t0 < 120  # killed at the deadline, not 300 s
    assert [d["k"] for d in lines] == ["early"]


def test_run_child_tolerates_bad_json_and_crash():
    bench = _load_bench()
    code = (
        "import json\n"
        "print('{not json', flush=True)\n"
        "print(json.dumps({'k': 'good', 'v': 3}), flush=True)\n"
        "raise SystemExit(1)\n"
    )
    lines = bench._run_child([sys.executable, "-c", code], 30.0, "t_crash")
    assert [d["k"] for d in lines] == ["good"]


def test_headline_json_contract(capsys):
    """_finalize-equivalent output shape: one parseable line with the four
    required driver fields, derived from whichever B=1 path won."""
    bench = _load_bench()
    # simulate what main() does with a completed mega child
    extras = {"megakernel_tokens_per_sec_b1": 28000.0}
    tps = extras["megakernel_tokens_per_sec_b1"]
    bench._emit({
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps / 5000.0, 3),
    })
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["metric"] == "decode_tokens_per_sec_per_chip"
    assert d["value"] == 28000.0
    assert d["unit"] == "tokens/s"
    assert d["vs_baseline"] == 5.6


def test_run_child_two_flushed_lines_then_hang():
    """Two JSON lines flushed in ONE write, then the child hangs: both must
    be collected even though the deadline kills the child (regression for
    the buffered-readline strand: the second line sat in the TextIOWrapper
    buffer and was discarded on kill)."""
    bench = _load_bench()
    code = (
        "import sys, time, json\n"
        "sys.stdout.write(json.dumps({'k': 'x', 'v': 1}) + '\\n'\n"
        "                 + json.dumps({'k': 'y', 'v': 2}) + '\\n')\n"
        "sys.stdout.flush()\n"
        "time.sleep(60)\n"
    )
    lines = bench._run_child([sys.executable, "-c", code], 3.0, "t_two")
    assert [d["k"] for d in lines] == ["x", "y"]
