"""CLI: per-image running-time evaluation harness.

Capability parity with the reference's Docker-based timing harness
(baseline/cellseg_time_eval.py:23-97): iterate images one at a time, run
the submission command against a single-image input dir, measure wall
time, apply the organizers' rank-time tolerance (max(0, t − 10 s) for
≤ 1 MP, max(0, t − 10 s·MP) above, :78-82), verify the output naming
contract ({stem}_label.tiff, :84-89), and write a per-case CSV.

Instead of `docker container run --gpus ...` the harness executes a shell
command template (use {input} and {output} placeholders) — e.g. the
cellseg_tpu predictor itself, or any other submission entry point.
"""

from __future__ import annotations

import argparse
import os
import shutil
import signal
import subprocess
import time

import numpy as np
import pandas as pd

from ..io import imread, list_images

join = os.path.join


def rank_time(real_time: float, n_pixels: int) -> float:
    """Organizers' tolerance rule (cellseg_time_eval.py:78-82)."""
    mp = n_pixels / 1e6
    if mp <= 1:
        return max(0.0, real_time - 10.0)
    return max(0.0, real_time - 10.0 * mp)


# Resource budgets the reference harness enforces on submissions: the
# container runs with `-m 28g --shm-size=28g` (cellseg_time_eval.py:69)
# and the challenge rules cap GPU memory at 10 GB (README.md:127). The
# TPU analogs recorded per case below: peak host RSS of the whole
# submission process tree, and peak device HBM (self-reported by the
# child via the CELLSEG_RECORD_HBM hook, see utils/hbm.py).
HOST_BUDGET_MB = 28 * 1024
DEVICE_BUDGET_MB = 10 * 1024


def _tree_rss_bytes(root_pid: int) -> int:
    """Sum of current VmRSS over root_pid and all its live descendants
    (one /proc scan). The budget analog is CONCURRENT memory — the sum a
    container cgroup would see — so sample the tree's instantaneous total
    and let the caller keep the running peak."""
    ppid_of, rss_of = {}, {}
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat", "rb") as f:
                stat = f.read().decode("ascii", "replace")
            # comm can contain spaces/parens: fields resume after last ')'
            after = stat[stat.rindex(")") + 2:].split()
            ppid_of[int(ent)] = int(after[1])  # field 4 (ppid)
            with open(f"/proc/{ent}/status", "rb") as f:
                for line in f:
                    if line.startswith(b"VmRSS:"):
                        rss_of[int(ent)] = int(line.split()[1]) * 1024
                        break
        except (OSError, ValueError):
            continue  # raced with process exit
    kids: dict[int, list[int]] = {}
    for pid, ppid in ppid_of.items():
        kids.setdefault(ppid, []).append(pid)
    total, frontier = 0, [root_pid]
    while frontier:
        pid = frontier.pop()
        total += rss_of.get(pid, 0)
        frontier.extend(kids.get(pid, ()))
    return total


def _run_with_peak_rss(cmd: str, timeout: float, env: dict) -> tuple[float, int]:
    """Run `cmd` through the shell; return (wall seconds, peak tree RSS
    bytes sampled at 0.2 s). Raises like subprocess.run(check=True)."""
    t0 = time.time()
    # own process group: killing only the shell would orphan grandchildren
    # that keep consuming the memory being budgeted and can race the next
    # case's workdir cleanup (ADVICE r4)
    proc = subprocess.Popen(cmd, shell=True, env=env,
                            start_new_session=True)

    def _kill_tree():
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()

    peak = 0
    try:
        while proc.poll() is None:
            peak = max(peak, _tree_rss_bytes(proc.pid))
            if time.time() - t0 > timeout:
                _kill_tree()
                proc.wait()
                raise subprocess.TimeoutExpired(cmd, timeout)
            time.sleep(0.2)
    finally:
        if proc.poll() is None:
            _kill_tree()
            proc.wait()
    if proc.returncode != 0:
        raise subprocess.CalledProcessError(proc.returncode, cmd)
    return time.time() - t0, peak


def main(argv=None):
    parser = argparse.ArgumentParser("Per-image running-time evaluation")
    parser.add_argument("-i", "--test_images", required=True, type=str)
    parser.add_argument("-c", "--command", required=True, type=str,
                        help="shell command template with {input} {output}")
    parser.add_argument("-o", "--output_path", default="./time_eval", type=str)
    parser.add_argument("-n", "--save_name", default="running_time", type=str)
    parser.add_argument("--timeout", default=600, type=float)
    args = parser.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    work_in = join(args.output_path, "inputs")
    work_out = join(args.output_path, "outputs")

    names = list_images(args.test_images)
    metrics = {"names": [], "real_running_time": [], "rank_running_time": [],
               "size_mp": [], "ok": [], "peak_rss_mb": [], "hbm_peak_mb": []}
    for name in names:
        try:
            shutil.rmtree(work_in, ignore_errors=True)
            shutil.rmtree(work_out, ignore_errors=True)
            os.makedirs(work_in)
            os.makedirs(work_out)
            shutil.copy(join(args.test_images, name), join(work_in, name))
            img = np.asarray(imread(join(work_in, name)))
            n_px = int(np.prod(img.shape[:2]))

            cmd = args.command.format(input=work_in, output=work_out)
            hbm_path = join(work_out, ".hbm.json")
            env = dict(os.environ)
            env["CELLSEG_RECORD_HBM"] = hbm_path
            dt, peak_rss = _run_with_peak_rss(cmd, args.timeout, env)
            hbm_mb = float("nan")
            if os.path.exists(hbm_path):  # self-reported by our CLIs
                import json

                with open(hbm_path) as f:
                    rec = json.load(f)
                if rec.get("peak_bytes_in_use"):
                    hbm_mb = round(rec["peak_bytes_in_use"] / 2**20, 1)
                os.remove(hbm_path)

            expected = name.split(".")[0] + "_label.tiff"
            ok = os.path.exists(join(work_out, expected))
            if not ok:
                print(f"!! {name}: missing output {expected}")
            rss_mb = round(peak_rss / 2**20, 1)
            metrics["names"].append(name)
            metrics["real_running_time"].append(round(dt, 2))
            metrics["rank_running_time"].append(round(rank_time(dt, n_px), 2))
            metrics["size_mp"].append(round(n_px / 1e6, 3))
            metrics["ok"].append(ok)
            metrics["peak_rss_mb"].append(rss_mb)
            metrics["hbm_peak_mb"].append(hbm_mb)
            over = ""
            if rss_mb > HOST_BUDGET_MB:
                over += f"  !! over {HOST_BUDGET_MB // 1024}G host budget"
            if hbm_mb == hbm_mb and hbm_mb > DEVICE_BUDGET_MB:
                over += f"  !! over {DEVICE_BUDGET_MB // 1024}G device budget"
            print(f"{name}: {dt:.2f}s real, "
                  f"{rank_time(dt, n_px):.2f}s rank ({n_px/1e6:.2f} MP), "
                  f"rss {rss_mb:.0f} MB, hbm {hbm_mb:.0f} MB{over}")
        except Exception as e:  # defensive per-case guard, like the reference
            print(f"!! {name} failed: {e}")

    df = pd.DataFrame(metrics)
    df.to_csv(join(args.output_path, args.save_name + ".csv"), index=False)
    if metrics["rank_running_time"]:
        print(f"median rank time: {np.median(metrics['rank_running_time']):.2f}s")


if __name__ == "__main__":
    main()
