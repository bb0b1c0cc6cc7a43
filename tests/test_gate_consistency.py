"""The shipped defaults must match what the serving gate certified.

Round-4 failure shape: the bench demoted a mode the hard gate failed, but
the `serve` CLI and README kept shipping it as the default. These tests pin
the three surfaces to the ONE shipped gate artifact (GATE_r05.json):

- bench.py's DEFAULT_MODE maps to a gate row with passes_gate_all_seeds;
- the serve CLI's default configuration maps to the same certified row;
- the artifact itself is the hard task, carries the selection-fresh seeds,
  and the certified row's support includes seeds the score was NOT selected
  on (GATE_r04 selected vote_frac on seeds 0-2; >=3 fresh seeds required).

A future demotion (or a new uncertified default) fails here instead of
silently shipping.
"""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_PATH = os.path.join(ROOT, "GATE_r05.json")
SELECTION_SEEDS = {0, 1, 2}  # vote_frac was picked from these (GATE_r04)


@pytest.fixture(scope="module")
def gate():
    with open(GATE_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def agg_modes(gate):
    return {m["mode"]: m for m in gate["aggregate"]["modes"]}


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _row_for(mode_cfg):
    from tpusr.tools.serving_gate import gate_row_name

    return gate_row_name(mode_cfg["sr"], mode_cfg["clf"],
                         border=mode_cfg["border"],
                         cascade_score=mode_cfg.get("score", "conf"),
                         cascade_frac=mode_cfg.get("frac"),
                         cascade_guard=mode_cfg.get("guard") is not None)


def test_gate_artifact_is_hard_task_with_fresh_seeds(gate):
    assert gate["task"]["name"] == "hard"
    assert gate["task"]["coverage_range"][0] < 1.0
    seeds = set(gate["aggregate"]["seeds"])
    assert len(seeds) >= 6
    assert len(seeds - SELECTION_SEEDS) >= 3, (
        "certification needs >=3 seeds the escalation score was not "
        f"selected on; have {sorted(seeds)}")
    # the reference path must be near its real operating point (gate
    # standard: min_reference_accuracy 0.85) on most seeds, and DEGENERATE
    # training runs (seed 4: 0.64) must be rare. Degenerate seeds STAY in
    # the artifact and still count toward passes_gate_all_seeds — keeping
    # them is conservative — and moderately-hard draws (seeds 9/11: 0.82,
    # 0.84) are likewise kept: lower reference accuracy means MORE boundary
    # images, which stresses the cascade harder, not less.
    accs = gate["aggregate"]["reference_accuracy_per_seed"]
    meaningful = [a for a in accs if a >= 0.85]
    degenerate = [a for a in accs if a < 0.75]
    assert len(meaningful) >= 0.7 * len(accs), accs
    assert len(meaningful) >= 5
    assert len(degenerate) <= 1, accs


def test_bench_default_mode_is_certified(gate, agg_modes):
    bench = _bench_module()
    row = _row_for(bench.MODES[bench.DEFAULT_MODE])
    assert row in agg_modes, f"bench default maps to {row!r}: no gate row"
    m = agg_modes[row]
    assert m["passes_gate_all_seeds"], (
        f"bench default {bench.DEFAULT_MODE!r} -> gate row {row!r} FAILED "
        f"the gate: {m}")
    # certified on EVERY seed in the artifact, including the fresh ones
    assert set(m["seeds"]) == set(gate["aggregate"]["seeds"]), m["seeds"]
    assert len(set(m["seeds"]) - SELECTION_SEEDS) >= 3
    # the headline default must serve a faithful SR image, not classify-only
    # (rows without the flag are f32-SR: faithful by construction)
    assert m.get("image_faithful_all_seeds", True), m
    # the strictest certified tier must also ship as a frontier row (a
    # zero-flip tier no longer exists on 9 seeds: seed 6's single
    # escalation-target flip is irreducible for every int8 mode)
    st = bench.MODES.get("cascade_int8_votefrac_strict")
    assert st is not None
    srow = _row_for(st)
    assert agg_modes[srow]["passes_gate_all_seeds"], agg_modes[srow]
    assert agg_modes[srow]["total_flips"] <= 1, agg_modes[srow]


def test_serve_cli_defaults_are_certified(agg_modes):
    from tpusr.cli.__main__ import build_parser
    from tpusr.tools.serving_gate import gate_row_name

    args = build_parser().parse_args(
        ["serve", "--edsr-ckpt", "x", "--vgg16-ckpt", "y"])
    row = gate_row_name(args.sr_mode, args.clf_mode,
                        border=not args.no_border,
                        cascade_score=args.cascade_score,
                        cascade_frac=args.cascade_frac,
                        cascade_guard=args.cascade_guard > 0)
    assert row in agg_modes, f"serve default maps to {row!r}: no gate row"
    m = agg_modes[row]
    assert m["passes_gate_all_seeds"], m


def test_bench_serving_defaults_are_certified(agg_modes):
    """bench_serving.py measures 'the serving default' — its defaults must
    map to the same certified gate row (round-5 staleness shape: it kept the
    mid-round bf16-SR frac=0.28125 candidate after the seed extension
    demoted every bf16-SR mode)."""
    import inspect

    from tpusr.tools.serving_gate import gate_row_name

    spec = importlib.util.spec_from_file_location(
        "bench_serving", os.path.join(ROOT, "bench_serving.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    defaults = {
        k: v.default
        for k, v in inspect.signature(
            mod.make_default_pipeline).parameters.items()
        if v.default is not inspect.Parameter.empty
    }
    row = gate_row_name(defaults["sr_mode"], defaults["clf_mode"],
                        border=True,
                        cascade_score=defaults["cascade_score"],
                        cascade_frac=defaults["cascade_frac"],
                        cascade_guard=defaults["cascade_guard"] is not None
                        and defaults["cascade_guard"] > 0)
    assert row in agg_modes, f"bench_serving default maps to {row!r}"
    assert agg_modes[row]["passes_gate_all_seeds"], agg_modes[row]


def test_bench_and_serve_share_one_default(agg_modes):
    """The production tier and the bench headline must be the SAME certified
    configuration — the round-4 inconsistency a serving gate exists to
    prevent."""
    from tpusr.cli.__main__ import build_parser
    from tpusr.tools.serving_gate import gate_row_name

    bench = _bench_module()
    bench_row = _row_for(bench.MODES[bench.DEFAULT_MODE])
    args = build_parser().parse_args(
        ["serve", "--edsr-ckpt", "x", "--vgg16-ckpt", "y"])
    serve_row = gate_row_name(args.sr_mode, args.clf_mode,
                              border=not args.no_border,
                              cascade_score=args.cascade_score,
                              cascade_frac=args.cascade_frac,
                              cascade_guard=args.cascade_guard > 0)
    assert bench_row == serve_row, (bench_row, serve_row)


def test_fidelity_strings_cite_the_shipped_artifact():
    """bench.py's fidelity strings must cite the artifact that exists and
    carries the rows (round-4 weakness: strings cited GATE_r04.json while
    the frac rows lived only in a side file)."""
    bench = _bench_module()
    cited = set()
    for cfg in bench.MODES.values():
        for tok in cfg["fidelity"].replace("(", " ").replace(")", " ").split():
            if tok.startswith("GATE") and tok.endswith(".json"):
                cited.add(tok)
    for artifact in cited:
        path = os.path.join(ROOT, artifact)
        assert os.path.exists(path), f"fidelity string cites missing {artifact}"
        if artifact == os.path.basename(GATE_PATH):
            with open(path) as f:
                modes = {m["mode"] for m in
                         json.load(f)["aggregate"]["modes"]}
            # the rows the cascade fidelity claims rest on must be present
            assert any(m.startswith("cascade_int8[vote_frac]")
                       for m in modes), modes
