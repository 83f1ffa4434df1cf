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


def test_latest_bench_artifact_schema():
    """The newest checked-in bench record (round >= 5, when lane isolation
    + headline promotion landed) must carry every tracked lane: a lane
    silently dropping out of the artifact fails CI instead of shipping
    (VERDICT r4 weak #1 / next-step #7). Historical artifacts predate the
    contract and are skipped."""
    import glob
    import re

    cands = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)", os.path.basename(p))
        if m:
            cands.setdefault(int(m.group(1)), []).append(p)
    if not cands or max(cands) < 5:
        pytest.skip("no round >= 5 bench artifact checked in yet")
    for p in cands[max(cands)]:
        with open(p) as f:
            doc = json.load(f)
        rec = doc.get("parsed", doc)  # driver wraps; builder copies are raw
        assert "missing_lanes" not in rec, (p, rec.get("missing_lanes"))
        assert rec["value"] > 0 and rec["unit"] == "audio-sec/chip-sec", p
        assert rec["accuracy_guard"]["tokens_match_dense"] is True, p
        assert rec["accuracy_guard"].get("weights") == "trained", p
        assert rec["metric"].endswith("_stop_early"), p
        tr = rec["trained"]
        assert tr["guard"]["tokens_match_dense"] is True, p
        assert tr["stop_early"]["value"] > 0 and tr["beam"]["value"] > 0, p
        assert 0.0 <= tr["speculative"]["acceptance_rate"] <= 1.0, p
        assert tr["speculative"]["e2e"]["value"] > 0, p
        for mode in ("lora", "full"):
            assert rec["train"][mode]["value"] > 0, (p, mode)
        assert rec["fixed_length_random_init"]["value"] > 0, p


def test_merge_lane_results_flags_missing_lanes():
    """A lane that silently produced no record must be NAMED in the
    artifact (VERDICT r4 weak #1: BENCH_r04 shipped without train.full and
    nothing flagged it) — pure-function check, no chip needed."""
    import bench

    serve = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.1}
    ok = bench.merge_lane_results(
        serve, {"lora": {"value": 2.0}, "full": {"value": 3.0}},
        ["lora", "full"],
    )
    assert "missing_lanes" not in ok
    assert ok["train"]["full"]["value"] == 3.0

    dropped = bench.merge_lane_results(
        serve, {"lora": {"value": 2.0}, "full": None}, ["lora", "full"]
    )
    assert dropped["missing_lanes"] == ["train:full"]
    assert "full" not in dropped["train"]

    no_serve = bench.merge_lane_results(None, {}, ["lora"])
    assert set(no_serve["missing_lanes"]) == {"serve", "train:lora"}
    assert no_serve["value"] == 0.0 and "error" in no_serve


def test_lane_record_usable_predicate():
    """The orchestrator's one-shot lane retry and merge_lane_results must
    agree on what counts as a usable lane record (a lane that crashed
    mid-measure prints either nothing or an {"error": ...} stub)."""
    import bench

    assert bench.lane_record_usable({"metric": "m", "value": 1.0})
    assert not bench.lane_record_usable(None)
    assert not bench.lane_record_usable({})
    assert not bench.lane_record_usable({"error": "no record"})
    assert not bench.lane_record_usable({"metric": "m"})
    assert not bench.lane_record_usable({"value": 1.0, "error": "partial"})


def test_promote_trained_headline_schema():
    """With a trained lane present, the headline becomes the trained
    stop_early record + trained guard, and the random-init numbers move to
    fixed_length_random_init (VERDICT r4 next-step #2)."""
    import bench

    raw = {
        "metric": "ts_asr_decode_rtf_medium_b128", "value": 1055.7,
        "unit": "audio-sec/chip-sec", "vs_baseline": 21.1,
        "accuracy_guard": {"tokens_match_dense": False},
        "beam": {"value": 343.7},
        "trained": {
            "guard": {"tokens_match_dense": True},
            "stop_early": {
                "metric": "ts_asr_decode_rtf_medium_b128_stop_early",
                "value": 1698.9, "unit": "audio-sec/chip-sec",
                "vs_baseline": 34.0,
            },
            "beam": {"value": 615.7},
        },
    }
    out = bench.promote_trained_headline(raw)
    assert out["metric"].endswith("_stop_early")
    assert out["value"] == 1698.9
    assert out["accuracy_guard"]["tokens_match_dense"] is True
    assert out["accuracy_guard"]["weights"] == "trained"
    assert out["beam"]["value"] == 615.7
    fx = out["fixed_length_random_init"]
    assert fx["value"] == 1055.7
    assert fx["accuracy_guard"]["tokens_match_dense"] is False
    assert fx["beam"]["value"] == 343.7
    # without a trained lane the record passes through unchanged
    assert bench.promote_trained_headline({"metric": "m", "value": 1.0}) == {
        "metric": "m", "value": 1.0
    }


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
            "BENCH_SUBPROC": "0",
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
            "BENCH_SUBPROC": "0",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "train" in payload, payload
    assert payload["train"]["lora"]["value"] > 0
    assert payload["train"]["lora"]["unit"] == "audio-sec/chip-sec"
    assert "missing_lanes" not in payload, payload


@pytest.mark.slow
def test_bench_orchestrator_runs_lanes_in_subprocesses():
    """Default mode (BENCH_SUBPROC=1): the parent never opens a device;
    each lane gets a fresh process — the structural fix for the r4
    full-FT OOM cascade. Asserts the merged record carries both the serve
    headline and the train sub-record with no missing lanes."""
    r = _run(
        "import bench; bench.main()",
        env_extra={
            "BENCH_MODEL": "dev",
            "BENCH_BATCH": "2",
            "BENCH_NEW_TOKENS": "2",
            "BENCH_ITERS": "1",
            "BENCH_FLASH": "0",
            "BENCH_TRAIN": "1",
            "BENCH_TRAIN_BATCH": "2",
            "BENCH_TRAIN_MODES": "lora",
            "BENCH_TRAINED": "0",
            "BENCH_GUARD": "0",
            "BENCH_BEAM_SUB": "0",
        },
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["value"] > 0
    assert payload["train"]["lora"]["value"] > 0
    assert "missing_lanes" not in payload, payload


def test_bench_orchestrator_retries_failed_lane_once(tmp_path):
    """A lane subprocess that dies on its first attempt (the transient
    tunneled-compile 500 class) must be retried ONCE on a fresh process and
    the merged record must ship complete — not with missing_lanes. Uses the
    BENCH_FAULT_LATCH one-shot fault injector: the serve lane's first
    attempt creates the latch file and dies; its retry (and the train lane,
    which sees the latch) proceed normally."""
    latch = str(tmp_path / "latch")
    r = _run(
        "import bench; bench.main()",
        env_extra={
            "BENCH_FAULT_LATCH": latch,
            "BENCH_MODEL": "dev",
            "BENCH_BATCH": "2",
            "BENCH_NEW_TOKENS": "2",
            "BENCH_ITERS": "1",
            "BENCH_FLASH": "0",
            "BENCH_TRAIN": "1",
            "BENCH_TRAIN_BATCH": "2",
            "BENCH_TRAIN_MODES": "lora",
            "BENCH_TRAINED": "0",
            "BENCH_GUARD": "0",
            "BENCH_BEAM_SUB": "0",
        },
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "retrying once on a fresh chip" in r.stderr
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["value"] > 0
    assert payload["train"]["lora"]["value"] > 0
    assert "missing_lanes" not in payload, payload
    with open(latch) as f:
        assert f.read() == "serve"  # the fault hit the first lane attempt


def test_bench_orchestrator_respects_retry_budget(tmp_path):
    """A lane that fails SLOWER than BENCH_LANE_RETRY_BUDGET_S is not
    retried (a near-complete lane re-run would double the bench wall);
    the record ships with the lane named in missing_lanes as before."""
    latch = str(tmp_path / "latch")
    r = _run(
        "import bench; bench.main()",
        env_extra={
            "BENCH_FAULT_LATCH": latch,
            "BENCH_LANE_RETRY_BUDGET_S": "0",
            "BENCH_MODEL": "dev",
            "BENCH_TRAIN": "0",
        },
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "over the retry budget" in r.stderr
    assert "(retry)" not in r.stderr
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["missing_lanes"] == ["serve"], payload


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
            "BENCH_DISTILL_STEPS": "8",
            "BENCH_SUBPROC": "0",
        },
        # ~8 compiled programs end-to-end; measured ~8 min alone on the
        # 1-core test host, so 600 s trips whenever anything shares the core
        timeout=1500,
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
    assert tr["speculative"]["draft"] == "distilled"
    assert tr["speculative"]["distill"]["steps"] == 8
    # e2e pipeline RTF sub-record (encode + speculative decode) — the
    # audio-s/chip-s operating point of `cli.decode --draft_path`
    assert tr["speculative"]["e2e"]["value"] > 0
    assert tr["speculative"]["e2e"]["greedy_e2e_rtf"] > 0
    assert tr["speculative"]["e2e"]["speedup_e2e"] > 0
    # trained lane present -> it IS the headline (VERDICT r4 #2)
    assert payload["metric"].endswith("_stop_early")
    assert payload["value"] == tr["stop_early"]["value"]
    assert payload["accuracy_guard"]["weights"] == "trained"
    assert payload["fixed_length_random_init"]["value"] > 0


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
