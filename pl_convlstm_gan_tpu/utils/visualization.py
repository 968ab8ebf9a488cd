"""Training-curve and station-comparison plots.

Host-side port of the reference utilities (``/root/reference/src/utils/
visualization.py:6-82``): obs-vs-pred scatter with the ideal diagonal, and the 2x2
panel (total loss, RMSE, four loss components, log-scale LR), saved at dpi=300."""
from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_stations_vs_pred(s_coords, true_vals, pred_vals,
                          save_path: str = "station_comparison.png",
                          dpi: int = 300) -> None:
    """Scatter of station observations vs predictions (visualization.py:6-30)."""
    true_vals = np.asarray(true_vals)
    pred_vals = np.asarray(pred_vals)
    plt.figure(figsize=(10, 6))
    plt.scatter(true_vals, pred_vals, alpha=0.7)
    max_val = max(np.max(true_vals), np.max(pred_vals))
    min_val = min(np.min(true_vals), np.min(pred_vals))
    plt.plot([min_val, max_val], [min_val, max_val], "r--", label="Ideal Prediction")
    plt.xlabel("True Values")
    plt.ylabel("Predicted Values")
    plt.title("Station Observed vs Predicted Precipitation")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(save_path, dpi=dpi)
    plt.close()


def plot_training_curves(history, save_path: str = "training_curves.png",
                         dpi: int = 300) -> None:
    """2x2 convergence panel (visualization.py:33-82). Expects the reference
    history keys: epoch, total_loss, point_loss, conserve_loss, smooth_loss,
    temporal_loss, rmse, learning_rate."""
    fig, axes = plt.subplots(2, 2, figsize=(15, 10))
    epochs = history["epoch"]

    axes[0, 0].plot(epochs, history["total_loss"], "b-", linewidth=2)
    axes[0, 0].set_xlabel("Epoch")
    axes[0, 0].set_ylabel("Total Loss")
    axes[0, 0].set_title("Training Loss Convergence")
    axes[0, 0].grid(True, alpha=0.3)

    axes[0, 1].plot(epochs, history["rmse"], "r-", linewidth=2)
    axes[0, 1].set_xlabel("Epoch")
    axes[0, 1].set_ylabel("RMSE")
    axes[0, 1].set_title("RMSE Convergence")
    axes[0, 1].grid(True, alpha=0.3)

    for key, label in [("point_loss", "Point Loss"), ("conserve_loss", "Conserve Loss"),
                       ("smooth_loss", "Smooth Loss"), ("temporal_loss", "Temporal Loss")]:
        if key in history:
            axes[1, 0].plot(epochs, history[key], label=label, linewidth=1.5)
    axes[1, 0].set_xlabel("Epoch")
    axes[1, 0].set_ylabel("Loss")
    axes[1, 0].set_title("Loss Components")
    axes[1, 0].legend()
    axes[1, 0].grid(True, alpha=0.3)

    if "learning_rate" in history:
        axes[1, 1].plot(epochs, history["learning_rate"], "g-", linewidth=2)
        axes[1, 1].set_xlabel("Epoch")
        axes[1, 1].set_ylabel("Learning Rate")
        axes[1, 1].set_title("Learning Rate Schedule")
        axes[1, 1].set_yscale("log")
        axes[1, 1].grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(save_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    print(f"Training curves saved to {save_path}")
