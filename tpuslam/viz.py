"""Offline map/trajectory visualizer.

Replaces the live Pangolin viewer stack (src/Viewer.cc, MapDrawer.cc:43
DrawMapPoints/:82 DrawKeyFrames/covisibility graph, FrameDrawer.cc:37
keypoint overlays) with matplotlib renderings written to PNG — the
observability tool for headless TPU runs.
"""

from __future__ import annotations

import numpy as np


def draw_map(m, path: str, trajectory=None, gt=None, elev=35, azim=-60):
    """Top+3D view of map points (black), keyframes (blue), covisibility
    edges (green), trajectory (red) — the MapDrawer color scheme."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 6))
    ax3 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)
    pts = m.mp_pos[: m.n_mp][m.mp_valid[: m.n_mp]]
    kfs = m.valid_kf_ids(all_maps=True)
    centers = np.stack([m.kf_center(k) for k in kfs]) if len(kfs) else None
    for ax, dims in ((ax3, (0, 1, 2)), (ax2, (0, 1))):
        if len(pts):
            ax.scatter(*[pts[:, d] for d in dims], s=1, c="k", alpha=0.3)
        if centers is not None:
            ax.scatter(*[centers[:, d] for d in dims], s=12, c="tab:blue")
            for k in kfs:  # covisibility graph
                ck = m.kf_center(k)
                for o, w in m.covis[k].items():
                    if o < k or not m.kf_valid[o] or w < 30:
                        continue
                    co = m.kf_center(o)
                    seg = np.stack([ck, co])
                    ax.plot(*[seg[:, d] for d in dims], c="g", lw=0.4,
                            alpha=0.5)
        if trajectory is not None and len(trajectory):
            tr = np.asarray(trajectory)
            ax.plot(*[tr[:, d] for d in dims], c="r", lw=1.0)
        if gt is not None and len(gt):
            g = np.asarray(gt)
            ax.plot(*[g[:, d] for d in dims], c="orange", lw=1.0, ls="--")
    ax3.view_init(elev=elev, azim=azim)
    ax2.set_aspect("equal")
    ax2.set_xlabel("x")
    ax2.set_ylabel("y")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def draw_frame(img, feats, mp_ids, path: str):
    """Current frame with keypoint overlays: tracked map points green,
    untracked detections red (ref FrameDrawer::DrawFrame)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(np.asarray(img), cmap="gray")
    xy = feats.xy[feats.valid]
    tracked = (mp_ids >= 0)[feats.valid] if mp_ids is not None else \
        np.zeros(len(xy), bool)
    ax.scatter(xy[~tracked, 0], xy[~tracked, 1], s=6, facecolors="none",
               edgecolors="r", lw=0.6)
    ax.scatter(xy[tracked, 0], xy[tracked, 1], s=8, facecolors="none",
               edgecolors="lime", lw=0.8)
    ax.set_title(f"{int(tracked.sum())} tracked / {len(xy)} keypoints")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
