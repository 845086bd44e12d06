"""The consolidated perf-queue runner's plan loading (no TPU, no renders)."""

import json
import os
import subprocess
import sys

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def test_plans_are_well_formed():
    sys.path.insert(0, SCRIPTS)
    try:
        import perf_queue
    finally:
        sys.path.remove(SCRIPTS)
    from tpu_pathtracer.config import RenderConfig

    assert set(perf_queue.PLANS) >= {"r4", "r4b", "r4d", "r4e", "r5"}
    for plan, queue in perf_queue.PLANS.items():
        names = [name for name, _ in queue]
        assert len(names) == len(set(names)), f"{plan}: duplicate variant names"
        for name, overrides in queue:
            # every override set must build a valid RenderConfig
            RenderConfig(max_path_length=8, **overrides)


def test_json_plan_file_round_trips(tmp_path):
    plan = [["a", {"samples_per_frame": 2}], ["b", {}]]
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    # --variants filter on a nonexistent name -> empty queue, exits cleanly
    # before touching any device
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "perf_queue.py"),
         "--plan", str(p), "--variants", "nope"],
        capture_output=True, text=True, timeout=240, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SUMMARY" in out.stdout
