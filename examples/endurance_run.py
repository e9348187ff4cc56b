"""Endurance + generalization run driver (VERDICT r4 item 1): the full
reference-magnitude recipe — 900,000 optimizer steps, batch 4, the
300k/400k/500k LR anneals — on a ~2 h real-audio corpus large and varied
enough that the val split cannot memorize, driven end-to-end through the
unmodified product surface (``efs2-pipeline``), with a SCRIPTED mid-run
kill -9 + Orbax resume.

Reference bars being matched: 900k steps / ~72 h on a GTX 1080 Ti
converging to total ~1.2 / mel ~0.4 (/root/reference/README.md:232-235);
LR anneal schedule (/root/reference/model/optimizer.py:40-43).

Stages (each resumable / skipped when its outputs exist):
  1. corpus      examples/pipeline_corpus.py --n-utts 3600 --speakers 10
                 --gain-jitter 0.12 --stretch-jitter 0.06   (~2 h audio)
  2. align+feat  efs2-pipeline --skip-train
  3. train       efs2-pipeline (stages skip, training runs); at
                 --kill-at steps the subprocess is SIGKILLed and
                 relaunched — the relaunch restores the latest Orbax
                 checkpoint (train/loop.py auto-restore) and continues.
  4. summarize   reports/endurance/: loss curves (train + val, anneal
                 markers), resume event record, final-loss summary.

Usage: python examples/endurance_run.py [--kill-at 120000] [--out reports/endurance]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = ["-p", "configs/Endurance-Concat-ZH/preprocess.yaml",
       "-m", "configs/Endurance-Concat-ZH/model.yaml",
       "-t", "configs/Endurance-Concat-ZH/train.yaml"]
RAW = os.path.join(ROOT, "raw_data", "Endurance-Concat-ZH")
PRE = os.path.join(ROOT, "preprocessed_data", "Endurance-Concat-ZH")
LOG = os.path.join(ROOT, "output", "log", "Endurance-Concat-ZH")


def _read_metrics(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                try:
                    out.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass  # torn tail line of a live file
    return out


def _last_step() -> int:
    recs = _read_metrics(os.path.join(LOG, "train", "metrics.jsonl"))
    return recs[-1]["step"] if recs else 0


def stage_corpus() -> None:
    if os.path.exists(os.path.join(RAW, "filelist.txt")):
        print("[corpus] present, skipping")
        return
    subprocess.run(
        [sys.executable, "examples/pipeline_corpus.py", "--out", RAW,
         "--n-utts", "3600", "--speakers", "10", "--seed", "5",
         "--gain-jitter", "0.12", "--stretch-jitter", "0.06"],
        cwd=ROOT, check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})


def stage_align_features() -> None:
    if os.path.exists(os.path.join(PRE, "train.txt")):
        print("[align+features] present, skipping")
        return
    subprocess.run(
        [sys.executable, "-m",
         "expressive_fastspeech2_mandarin_tpu.cli.pipeline",
         *CFG, "--skip-train"], cwd=ROOT, check=True)


def _launch_train() -> subprocess.Popen:
    # Own process group so the scripted kill takes the whole tree.
    return subprocess.Popen(
        [sys.executable, "-m",
         "expressive_fastspeech2_mandarin_tpu.cli.pipeline", *CFG],
        cwd=ROOT, start_new_session=True)


def stage_train(kill_at: int, out_dir: str) -> dict:
    """Train to 900k with one scripted SIGKILL at ``kill_at`` steps."""
    event: dict = {"kill_at_requested": kill_at}
    prior = os.path.join(out_dir, "resume_event.json")
    if _last_step() >= kill_at:
        # Resumed driver: keep any previously recorded kill/resume events.
        if os.path.exists(prior):
            with open(prior) as f:
                event = {**json.load(f), **event}
        event["driver_resumed_past_kill_point"] = True
        proc = _launch_train()
        proc.wait()
        if proc.returncode != 0:
            raise RuntimeError(f"training exited rc={proc.returncode}")
        event["final_step"] = _last_step()
        os.makedirs(out_dir, exist_ok=True)
        with open(prior, "w") as f:
            json.dump(event, f, indent=1)
        return event

    proc = _launch_train()
    while True:
        time.sleep(30)
        if proc.poll() is not None:
            raise RuntimeError(
                f"training exited rc={proc.returncode} before kill point")
        step = _last_step()
        if step >= kill_at:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            event["killed_at_step"] = step
            event["killed_unix"] = time.time()
            print(f"[kill] SIGKILL at step {step}")
            break
    # Relaunch: train/loop.py restores the latest Orbax checkpoint. The
    # tunnel-attached chip accepts one client at a time and wedges a new
    # client started within ~30 s of the previous one's death
    # (.claude/skills/verify: "one TPU client at a time").
    time.sleep(45)
    proc = _launch_train()
    time.sleep(120)
    event["resumed_from_step"] = _resume_start()
    proc.wait()
    if proc.returncode != 0:
        raise RuntimeError(f"resumed training exited rc={proc.returncode}")
    event["final_step"] = _last_step()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "resume_event.json"), "w") as f:
        json.dump(event, f, indent=1)
    return event


def _resume_start() -> int | None:
    """First step logged after the most recent gap in wall-clock time."""
    recs = _read_metrics(os.path.join(LOG, "train", "metrics.jsonl"))
    start = None
    for a, b in zip(recs, recs[1:]):
        if b["time"] - a["time"] > 60:
            start = b["step"]
    return start


def summarize(out_dir: str, event: dict | None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    train = _read_metrics(os.path.join(LOG, "train", "metrics.jsonl"))
    val = _read_metrics(os.path.join(LOG, "val", "metrics.jsonl"))
    if not train:
        print("no metrics; nothing to summarize")
        return

    def tail_mean(recs, key, n=20):
        xs = [r[key] for r in recs[-n:] if key in r]
        return sum(xs) / max(len(xs), 1)

    # steps/s over the whole run excluding gaps > 60 s (compiles, the kill).
    stepped, seconds = 0, 0.0
    for a, b in zip(train, train[1:]):
        dt = b["time"] - a["time"]
        if 0 < dt <= 60:
            stepped += b["step"] - a["step"]
            seconds += dt
    summary = {
        "total_steps": train[-1]["step"],
        "train_total_tail": round(tail_mean(train, "total_loss"), 4),
        "train_mel_tail": round(tail_mean(train, "mel_loss"), 4),
        "val_total_tail": round(tail_mean(val, "total_loss", 3), 4),
        "val_mel_tail": round(tail_mean(val, "mel_loss", 3), 4),
        "val_points": len(val),
        "steps_per_s_e2e": round(stepped / seconds, 1) if seconds else None,
        "wall_hours_stepping": round(seconds / 3600, 2),
        "reference_bar": {"total": 1.2, "mel": 0.4,
                          "source": "README.md:232-235 (17.5k-utt ESD)"},
        "resume_event": event,
    }
    with open(os.path.join(out_dir, "train_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(13, 4.5))
    for ax, key, title in zip(axes, ("total_loss", "mel_loss"),
                              ("total loss", "mel loss")):
        ax.plot([r["step"] for r in train], [r[key] for r in train],
                lw=0.6, alpha=0.6, label="train")
        if val:
            ax.plot([r["step"] for r in val], [r[key] for r in val],
                    lw=1.6, label="val")
        for s in (300000, 400000, 500000):
            ax.axvline(s, color="gray", ls=":", lw=0.8)
        if event and event.get("killed_at_step"):
            ax.axvline(event["killed_at_step"], color="red", ls="--",
                       lw=0.8, label="kill -9 / resume")
        ax.set_xlabel("step")
        ax.set_title(title)
        ax.set_yscale("log")
        ax.legend()
    fig.suptitle("Endurance run: 900k steps, batch 4, anneals at "
                 "300k/400k/500k (dotted)")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "loss_curves.png"), dpi=120)
    print(f"wrote {out_dir}/loss_curves.png")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kill-at", type=int, default=120000)
    ap.add_argument("--out", default="reports/endurance")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()
    out_dir = os.path.join(ROOT, args.out)
    if args.summarize_only:
        ev = None
        p = os.path.join(out_dir, "resume_event.json")
        if os.path.exists(p):
            ev = json.load(open(p))
        summarize(out_dir, ev)
        return
    stage_corpus()
    stage_align_features()
    event = stage_train(args.kill_at, out_dir)
    summarize(out_dir, event)


if __name__ == "__main__":
    main()
