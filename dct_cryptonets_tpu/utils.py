"""Training utilities: meters, early stopping, accuracy, LR schedule.

Behavioral parity with the reference's utils.py:74-138 (AverageMeter,
EarlyStopper with patience/threshold, top-k accuracy, step-decay LR), kept
host-side and framework-agnostic.
"""
import math


class AverageMeter:
    """Running average (reference utils.py:74-89)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class EarlyStopper:
    """Validation-loss early stopping (reference utils.py:92-108):
    patience consecutive epochs worse than best + threshold -> stop."""

    def __init__(self, patience=10, threshold=0.03):
        self.patience = patience
        self.threshold = threshold
        self.counter = 0
        self.min_validation_loss = math.inf

    def __call__(self, validation_loss):
        if validation_loss < self.min_validation_loss:
            self.min_validation_loss = validation_loss
            self.counter = 0
        elif validation_loss > (self.min_validation_loss + self.threshold):
            self.counter += 1
            if self.counter >= self.patience:
                return True
        return False


def topk_accuracy(logits, targets, ks=(1, 5)):
    """Top-k accuracy in percent (reference utils.py:111-124)."""
    import numpy as np
    logits = np.asarray(logits)
    targets = np.asarray(targets)
    maxk = min(max(ks), logits.shape[1])
    pred = np.argsort(-logits, axis=1)[:, :maxk]
    correct = pred == targets[:, None]
    out = []
    for k in ks:
        kk = min(k, logits.shape[1])
        out.append(100.0 * correct[:, :kk].any(axis=1).mean())
    return out


def step_decay_lr(base_lr, schedule, gamma, epoch):
    """LR after step decays at `schedule` epochs (reference utils.py:127-133,
    applied with epoch+1 semantics)."""
    lr = base_lr
    if schedule:
        for e in schedule:
            if epoch + 1 >= e:
                lr *= gamma
    return lr
