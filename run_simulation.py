"""CLI driver: run a scene JSON end to end with periodic frame export.

Flag- and layout-compatible with the reference driver
(``run_simulation.py`` in jason-huang03/SPH_Project): ``--scene_file`` picks
the JSON, frame cadence comes from ``fps`` / ``timeStepSize`` /
``outputInterval``, total steps from ``totalTime``, and exports land in
``<scene>_output/<frame:06d>/``. Extra conveniences: ``--steps`` caps the run,
``--no-export`` disables IO, ``--device`` forces a JAX platform, and per-step
solver telemetry prints like the reference's convergence logs.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_file", default="", help="scene file")
    parser.add_argument("--steps", type=int, default=None,
                        help="cap on simulation steps (default: totalTime/dt)")
    parser.add_argument("--no-export", action="store_true")
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_interval", type=int, default=0,
                        help="steps between checkpoints (0 = off)")
    parser.add_argument("--log_json", default=None,
                        help="JSONL file for per-step telemetry")
    parser.add_argument("--resume", default=None,
                        help="checkpoint directory to resume from")
    parser.add_argument("--viewer", type=int, default=0, metavar="PORT",
                        help="serve a live browser view on this port "
                             "(the GGUI-window counterpart; 0 = off)")
    args = parser.parse_args()

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
    platform = os.environ.get("JAX_PLATFORMS")
    if platform:
        # this environment's TPU plugin swallows the env var; pin explicitly
        import jax
        jax.config.update("jax_platforms", platform)

    from sph_project_tpu.scene import load_scene
    from sph_project_tpu.sim import Simulation
    from sph_project_tpu.io.exporters import FrameExporter

    scene, state = load_scene(args.scene_file)
    cfg = scene.config
    params = scene.params

    fps = cfg.get_cfg("fps") or 60
    dt = params.dt
    output_interval = int((1.0 / fps) / dt)
    if cfg.get_cfg("outputInterval"):
        output_interval = cfg.get_cfg("outputInterval")
    total_time = cfg.get_cfg("totalTime") or 10.0
    total_rounds = int(total_time / dt)
    if args.steps is not None:
        total_rounds = min(total_rounds, args.steps)

    scene_name = os.path.splitext(os.path.basename(args.scene_file))[0] or "scene"
    out_dir = args.output_dir or f"{scene_name}_output"
    exporter = None
    if not args.no_export:
        exporter = FrameExporter(
            scene, out_dir,
            export_ply=bool(cfg.get_cfg("exportPly")),
            export_obj=bool(cfg.get_cfg("exportObj")),
            export_frame=bool(cfg.get_cfg("exportFrame")),
        )

    sim = Simulation(scene, state)

    if args.resume:
        from sph_project_tpu.io import checkpoint
        sim.state = checkpoint.restore(args.resume, sim.state)
        print(f"resumed from {args.resume} at step "
              f"{int(sim.state.step_count)}")

    print(f"Simulation method: {params.simulation_method}")
    print(f"particles: {params.n_particles}  dt: {dt}  steps: {total_rounds}")

    viewer = None
    if args.viewer:
        from sph_project_tpu.io.viewer import LiveViewer
        viewer = LiveViewer(params, port=args.viewer)
        print(f"live viewer: http://localhost:{viewer.port}")

    from sph_project_tpu.utils.telemetry import StepTelemetry
    telem = StepTelemetry(log_file=args.log_json,
                          print_every=0 if args.quiet else 1)
    start_cnt = int(sim.state.step_count)
    t_prev = time.perf_counter()
    for cnt in range(start_cnt, total_rounds):
        diag = sim.step()
        telem.record(diag, cnt, params.n_particles)
        if exporter is not None and cnt % output_interval == 0:
            exporter.dump(sim.state, cnt)
        if viewer is not None and cnt % max(output_interval // 4, 1) == 0:
            now = time.perf_counter()
            # steps elapsed since the previous update, not 1 (the update
            # fires only every output_interval//4 steps)
            viewer.update(sim.state,
                          steps_per_s=max(output_interval // 4, 1) /
                          max(now - t_prev, 1e-9))
            t_prev = now
        if args.checkpoint_interval and cnt and cnt % args.checkpoint_interval == 0:
            from sph_project_tpu.io import checkpoint
            checkpoint.save(os.path.join(out_dir, "ckpt"), sim.state)

    summ = telem.summary(params.n_particles)
    telem.close()
    if summ["steps"] > 0:
        print(f"Simulation Finished: {summ['steps']} steps in "
              f"{summ['elapsed_s']}s ({summ['steps_per_s']} steps/s, "
              f"{summ['particle_steps_per_s']:.3g} particle-steps/s)")


if __name__ == "__main__":
    main()
