"""Driver-contract tests: bench.py emits its JSON line and __graft_entry__'s
hooks run — in subprocesses so backend-config mutation can't leak into the
suite. Kept tiny (dev/tiny configs on CPU) but end-to-end."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra=None, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_bench_emits_json_line():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench; bench.main()",
        env_extra={
            "BENCH_MODEL": "dev",
            "BENCH_BATCH": "2",
            "BENCH_NEW_TOKENS": "2",
            "BENCH_ITERS": "1",
            "BENCH_FLASH": "0",
            # the training/trained legs have their own shape tests below;
            # keeping them out here holds this contract check under the
            # subprocess timeout on the compile-bound CPU test host
            "BENCH_TRAIN": "0",
            "BENCH_TRAINED": "0",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["unit"] == "audio-sec/chip-sec"
    assert payload["value"] > 0


@pytest.mark.slow
def test_bench_train_leg_emits_train_record():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench; bench.main()",
        env_extra={
            "BENCH_MODEL": "dev",
            "BENCH_BATCH": "2",
            "BENCH_NEW_TOKENS": "2",
            "BENCH_ITERS": "1",
            "BENCH_FLASH": "0",
            "BENCH_TRAIN": "1",
            "BENCH_TRAIN_BATCH": "2",
            "BENCH_TRAIN_MODES": "lora",  # one mode holds the CPU timeout
            "BENCH_TRAINED": "0",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "train" in payload, payload
    assert payload["train"]["lora"]["value"] > 0
    assert payload["train"]["lora"]["unit"] == "audio-sec/chip-sec"


@pytest.mark.slow
def test_bench_trained_lane_emits_records():
    """The trained-weights lane's machinery (overfit -> guard -> stop_early
    -> beam -> speculative) at dev dims with 6 steps on CPU: record shapes
    only — the real measurements need the chip."""
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench; bench.main()",
        env_extra={
            "BENCH_MODEL": "dev",
            "BENCH_BATCH": "4",
            "BENCH_NEW_TOKENS": "4",
            "BENCH_ITERS": "1",
            "BENCH_FLASH": "0",
            "BENCH_GUARD": "0",
            "BENCH_BEAM_SUB": "2",
            "BENCH_BEAM_BATCH": "4",
            "BENCH_TRAIN": "0",
            "BENCH_TRAINED": "1",
            "BENCH_TRAINED_STEPS": "6",
            "BENCH_TRAINED_SPEC": "1",
            "BENCH_TRAINED_SPEC_BATCH": "4",
            "BENCH_SPEC_GAMMA": "2",
            "BENCH_SPEC_DRAFT": "1",
        },
        # ~7 compiled programs end-to-end; measured ~8 min alone on the
        # 1-core test host, so 600 s trips whenever anything shares the core
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    tr = payload.get("trained")
    assert tr, payload
    assert tr["steps"] == 6 and tr["items"] == 32
    assert set(tr["guard"]) >= {
        "tokens_match_dense", "token_agreement", "dense_exact_vs_corpus",
    }
    assert tr["stop_early"]["value"] > 0
    assert tr["beam"]["value"] > 0
    assert 0.0 <= tr["speculative"]["acceptance_rate"] <= 1.0
    assert tr["speculative"]["tokens_match_greedy"] in (True, False)


@pytest.mark.slow
def test_graft_entry_and_dryrun():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g;"
        "fn, args = g.entry();"
        "out = jax.jit(fn)(*args);"
        "print('ENTRY_OK', float(out));"
        "g.dryrun_multichip(8)",
        env_extra={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        # six dryrun legs compile the full train step over a virtual mesh;
        # ~7 min alone on the 1-core host, more when anything shares it
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ENTRY_OK" in r.stdout
    assert "dryrun_multichip ok" in r.stdout
