"""Plot artifacts: example-image grid and confusion-matrix heatmap.

Parity with reference utils.py:141-184 (``plot_examples``, ``pred_classes``)
— the reference's two eyeball-check artifacts written into the checkpoint
directory.  matplotlib is imported lazily so headless training without
plots never pays for it.
"""
import os

import numpy as np


def plot_examples(ckpt_dir: str, images: np.ndarray, labels: np.ndarray,
                  classes, k: int = 16, seed: int = 0):
    """Save a 4x4 grid of training examples (reference utils.py:141-156)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(images), size=min(k, len(images)), replace=False)
    plt.figure(figsize=(10, 10))
    for i, j in enumerate(idx):
        img = images[j].astype(np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        ax = plt.subplot(4, 4, i + 1)
        ax.imshow(img)
        ax.set_title(f"Class : {classes[labels[j]]}", fontsize=10)
        ax.axis("off")
    out = os.path.join(ckpt_dir, "example_images.png")
    plt.savefig(out, dpi=200)
    plt.close()
    return out


def confusion_heatmap(ckpt_dir: str, y_true, y_pred, classes):
    """Save a normalized confusion-matrix heatmap (reference
    utils.py:159-184, sans seaborn)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(classes)
    mat = np.zeros((n, n))
    for t, p in zip(np.asarray(y_true), np.asarray(y_pred)):
        mat[t, p] += 1
    mat = mat / max(mat.sum(), 1) * 10

    plt.figure(figsize=(12, 7))
    plt.imshow(mat, cmap="viridis")
    plt.colorbar()
    plt.xticks(range(n), classes, rotation=45, ha="right")
    plt.yticks(range(n), classes)
    for i in range(n):
        for j in range(n):
            plt.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                     fontsize=7,
                     color="white" if mat[i, j] < mat.max() / 2 else "black")
    plt.tight_layout()
    out = os.path.join(ckpt_dir, "heatmap.png")
    plt.savefig(out, dpi=200)
    plt.close()
    return out
