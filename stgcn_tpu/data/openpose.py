"""OpenPose JSON keypoints -> per-video ``.npy`` + ``metadata.csv`` ingestion.

Counterpart of src/data/process_openpose.py:11-139: each video has one JSON
per frame; we take person[0]'s ``pose_keypoints_2d`` reshaped ``(25, 3)``,
skip person-less frames, and write ``{subject}_{action}_{scenario}.npy``.
QA helpers detect unprocessed videos and long runs of missing frames.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

ACTIONS = ("boxing", "handclapping", "handwaving", "jogging", "running",
           "walking")
# OpenPose appends "_%012d_keypoints.json" (28 chars) to the video stem.
_SUFFIX_LEN = 28


def _video_stems(action_dir: Path) -> list[str]:
    names = {f.name[:-_SUFFIX_LEN] for f in action_dir.glob("*.json")}
    return sorted(names)


def frames_from_json(json_paths: list[Path]) -> tuple[np.ndarray, list[int]]:
    """Stack per-frame keypoints; returns ``(T, 25, 3)`` + skipped frame ids."""
    frames, skipped = [], []
    for i, p in enumerate(json_paths):
        with open(p) as f:
            data = json.load(f)
        people = data.get("people", [])
        if not people:
            skipped.append(i)
            continue
        kp = np.asarray(people[0]["pose_keypoints_2d"], np.float32)
        frames.append(kp.reshape(25, 3))
    if not frames:
        return np.zeros((0, 25, 3), np.float32), skipped
    return np.stack(frames), skipped


def process_openpose(keypoints_dir: str, output_dir: str,
                     actions: tuple[str, ...] = ACTIONS) -> str:
    """Ingest ``keypoints_dir/{action}/*.json`` -> npy files + metadata.csv."""
    os.makedirs(output_dir, exist_ok=True)
    meta = {"subject": [], "action": [], "scenario": [], "filename": []}
    for action in actions:
        action_dir = Path(keypoints_dir) / action
        if not action_dir.is_dir():
            continue
        for stem in _video_stems(action_dir):
            json_files = sorted(action_dir.glob(stem + "*.json"))
            seq, _ = frames_from_json(json_files)
            subject, _, scenario, *_ = stem.split("_")
            fname = f"{subject}_{action}_{scenario}.npy"
            np.save(os.path.join(output_dir, fname), seq)
            meta["subject"].append(subject)
            meta["action"].append(action)
            meta["scenario"].append(scenario)
            meta["filename"].append(fname)
    meta_path = os.path.join(output_dir, "metadata.csv")
    pd.DataFrame(meta).to_csv(meta_path, index=False)
    return meta_path


def check_all_videos_processed(videos_dir: str, keypoints_dir: str,
                               actions: tuple[str, ...] = ACTIONS) -> int:
    """Assert every ``.avi`` has keypoints; returns the total video count."""
    count = 0
    for action in actions:
        vids = sorted(f[:-4] for f in os.listdir(os.path.join(videos_dir, action))
                      if f.endswith(".avi"))
        stems = _video_stems(Path(keypoints_dir) / action)
        missing = set(vids) - set(stems)
        if missing:
            raise RuntimeError(f"{action}: unprocessed videos {sorted(missing)}")
        count += len(vids)
    return count


def videos_to_reprocess(keypoints_dir: str, max_missing_run: int = 30,
                        actions: tuple[str, ...] = ACTIONS) -> list[str]:
    """Videos with >= ``max_missing_run`` consecutive person-less frames."""
    redo = []
    for action in actions:
        action_dir = Path(keypoints_dir) / action
        if not action_dir.is_dir():
            continue
        for stem in _video_stems(action_dir):
            json_files = sorted(action_dir.glob(stem + "*.json"))
            _, skipped = frames_from_json(json_files)
            runs = defaultdict(int)
            run = 0
            prev = None
            for i in skipped:
                run = run + 1 if prev == i - 1 else 1
                prev = i
                runs[stem] = max(runs[stem], run)
            if runs[stem] >= max_missing_run:
                redo.append(stem)
    return sorted(set(redo))
