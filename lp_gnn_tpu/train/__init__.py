from .losses import unbalanced, balanced, focal, LOSS_REGISTRY, labels_to_balanced_weights
from .metrics import accuracy
