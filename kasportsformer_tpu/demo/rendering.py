"""Rendering stages of the demo (≙ `demo/demo.py:91-128`, `:159-192`,
`:267-323`): 2D skeleton overlays, 3D matplotlib renders, side-by-side
figures, and the output video."""

from __future__ import annotations

import os

import numpy as np

KINEMATIC_TREE = [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7],
                  [7, 8], [8, 9], [9, 10], [8, 11], [11, 12], [12, 13],
                  [8, 14], [14, 15], [15, 16]]

BGR_LINECOLORS = [
    (185, 128, 46), (14, 127, 255), (65, 169, 65), (62, 61, 218),
    (193, 113, 155), (84, 95, 146), (195, 121, 227), (129, 129, 129),
    (39, 191, 190), (209, 193, 35), (126, 221, 251), (208, 224, 64),
    (65, 15, 88), (238, 130, 238), (192, 129, 255), (38, 64, 239),
]

HEX_LINECOLORS = [
    "#2e80b9", "#ff7f0e", "#41a941", "#da3d3e", "#9b71c1", "#925f54",
    "#e379c3", "#818181", "#bebf27", "#23c1d1", "#fbdd7e", "#40e0d0",
    "#580f41", "#ee82ee", "#ff81c0", "#ef4026",
]


def draw_2d_pose(kpts: np.ndarray, img: np.ndarray) -> np.ndarray:
    """Overlay the 17-joint skeleton on a BGR frame (`demo/demo.py:91-105`)."""
    import cv2

    for j, (a, b) in enumerate(KINEMATIC_TREE):
        start = tuple(int(v) for v in kpts[a][:2])
        end = tuple(int(v) for v in kpts[b][:2])
        cv2.line(img, start, end, BGR_LINECOLORS[j], 2)
        cv2.circle(img, start, radius=2, color=(0, 255, 255), thickness=-1)
        cv2.circle(img, end, radius=2, color=(0, 255, 255), thickness=-1)
    return img


def render_3d_pose(pose: np.ndarray, ax, elev: float = 20, azim: float = 10
                   ) -> None:
    """Render one (17, 3) world-space pose on a 3D axis
    (`demo/demo.py:159-192`)."""
    ax.view_init(elev=elev, azim=azim)
    for i, (a, b) in enumerate(KINEMATIC_TREE):
        xs, ys, zs = ([pose[a, d], pose[b, d]] for d in range(3))
        ax.plot(xs, ys, zs, c=HEX_LINECOLORS[i])
    ax.scatter(pose[:, 0], pose[:, 1], pose[:, 2], c="yellow")
    radius, radius_z = 0.72, 0.7
    xroot, yroot, zroot = pose[0]
    ax.set_xlim3d([-radius + xroot, radius + xroot])
    ax.set_ylim3d([-radius + yroot, radius + yroot])
    ax.set_zlim3d([-radius_z + zroot, radius_z + zroot])
    ax.set_aspect("auto")
    white = (1.0, 1.0, 1.0, 0.0)
    ax.xaxis.set_pane_color(white)
    ax.yaxis.set_pane_color(white)
    ax.zaxis.set_pane_color(white)
    ax.tick_params("x", labelbottom=False)
    ax.tick_params("y", labelleft=False)
    ax.tick_params("z", labelleft=False)


def save_3d_pose_figure(pose: np.ndarray, path: str, elev: float = 0,
                        azim: float = 0) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9.6, 5.4))
    gs = gridspec.GridSpec(1, 1)
    gs.update(wspace=0.0, hspace=0.05)
    ax = plt.subplot(gs[0], projection="3d")
    render_3d_pose(pose, ax, elev, azim)
    plt.savefig(path, dpi=200, format="png", bbox_inches="tight")
    plt.close(fig)


def compose_demo_figures(pose2d_dir: str, pose3d_dir: str, out_dir: str) -> int:
    """Side-by-side 2D/3D panels (`demo/demo.py:267-304`)."""
    import glob

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    images_2d = sorted(glob.glob(os.path.join(pose2d_dir, "*.png")))
    images_3d = sorted(glob.glob(os.path.join(pose3d_dir, "*.png")))
    n = min(len(images_2d), len(images_3d))
    for i in range(n):
        img2d = plt.imread(images_2d[i])
        img3d = plt.imread(images_3d[i])
        if img2d.shape[0] > img2d.shape[1]:
            edge = (img2d.shape[0] - img2d.shape[1]) // 2
            img2d = img2d[edge:img2d.shape[0] - edge, :]
        else:
            edge = (img2d.shape[1] - img2d.shape[0]) // 2
            img2d = img2d[:, edge:img2d.shape[1] - edge]
        edge3d = 130
        img3d = img3d[edge3d:img3d.shape[0] - edge3d,
                      edge3d:img3d.shape[1] - edge3d]
        fig = plt.figure(figsize=(15.0, 5.4))
        for k, img in ((121, img2d), (122, img3d)):
            ax = plt.subplot(k)
            ax.set_xticks([])
            ax.set_yticks([])
            plt.axis("off")
            ax.imshow(img)
        plt.subplots_adjust(top=1, bottom=0, right=1, left=0, hspace=0, wspace=0)
        plt.margins(0, 0)
        plt.savefig(os.path.join(out_dir, "%04d_demo.png" % i), dpi=200,
                    bbox_inches="tight")
        plt.close(fig)
    return n


def write_video(frames_dir: str, out_path: str, fps: int) -> None:
    """PNG frame directory -> mp4 (`demo/demo.py:307-323`)."""
    import glob

    import cv2

    files = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    first = cv2.imread(files[0])
    size = (first.shape[1], first.shape[0])
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, size)
    for path in files:
        writer.write(cv2.imread(path))
    writer.release()
