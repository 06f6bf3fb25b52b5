"""Network stem/pool topology table.

Data mirrored from the reference ``all_network_perturbations``
(reference models/backbone.py:345-582): keyed
``"{stem_channels}_{in_channels}_{img_size}"``; DCT inputs get a 1x1 conv
stem with no pooling, RGB 224^2 gets the classic 7x7/s2 stem + maxpool.
``relu1`` defaults to True when absent (backbone.py:149, 248).
"""
from dataclasses import dataclass


@dataclass(frozen=True)
class StemSpec:
    conv1_kernel: int | None
    conv1_stride: int | None
    conv1_padding: int | None
    pool1_kernel: int | None
    pool1_stride: int | None
    avgpool_kernel: int
    relu1: bool = True


def _s(k, s, p, pk, ps, ap, relu1=True):
    return StemSpec(k, s, p, pk, ps, ap, relu1)


NETWORK_PERTURBATIONS: dict[str, StemSpec] = {
    # Traditional ResNet20 models
    "16_3_32":   _s(3, 1, 1, None, None, 7),
    # DCT-CryptoNets ResNet20 models
    "48_24_32":  _s(1, 1, 0, None, None, 16),
    "48_24_64":  _s(1, 1, 0, None, None, 32),
    "48_3_32":   _s(3, 1, 1, None, None, 7),
    "48_24_8":   _s(1, 1, 0, None, None, 3),
    "48_24_16":  _s(1, 1, 0, None, None, 7),
    "48_48_8":   _s(1, 1, 0, None, None, 3),
    "48_48_16":  _s(1, 1, 0, None, None, 7),
    # NOTE: the reference README's CIFAR ResNet-18 DCT row is "(24, 16, 16)"
    # (README.md:88) but all_network_perturbations has no '64_24_16' entry,
    # and ResNet-18's three stride-2 stages reduce 16^2 to 2^2, which the
    # avgpool_kernel=3 of the '64_48_16' entry cannot pool — that published
    # row is not buildable/runnable from the reference code as shipped.
    "64_48_16":  _s(1, 1, 0, None, None, 3),
    # RGB-based ResNet18
    "64_6_32":   _s(1, 1, 0, None, None, 3, relu1=False),
    "64_3_32":   _s(3, 1, 1, None, None, 3),
    "64_3_128":  _s(7, 2, 3, 3, 2, 3),
    "64_3_224":  _s(7, 2, 3, 3, 2, 7),
    "64_3_448":  _s(7, 2, 3, 3, 2, 14),
    "64_3_1024": _s(7, 2, 3, 7, 4, 11),
    # DCT-based ResNet18
    "64_6_56":   _s(1, 1, 0, None, None, 5, relu1=False),
    "64_12_56":  _s(1, 1, 0, None, None, 5, relu1=False),
    "64_24_56":  _s(1, 1, 0, None, None, 5, relu1=False),
    "64_48_56":  _s(1, 1, 0, None, None, 5, relu1=False),
    "64_64_56":  _s(1, 1, 0, None, None, 5, relu1=False),
    "64_192_56": _s(1, 1, 0, None, None, 5, relu1=False),
    "64_6_112":  _s(1, 1, 0, None, None, 14, relu1=False),
    "64_24_112": _s(1, 1, 0, None, None, 14, relu1=False),
    "64_48_112": _s(1, 1, 0, None, None, 14, relu1=False),
    "64_64_112": _s(1, 1, 0, None, None, 14, relu1=False),
    "64_192_112": _s(1, 1, 0, None, None, 14, relu1=False),
}


def stem_spec(stem_channels: int, in_channels: int, img_size: int) -> StemSpec:
    key = f"{stem_channels}_{in_channels}_{img_size}"
    if key not in NETWORK_PERTURBATIONS:
        raise KeyError(
            f"no topology entry for {key!r}; known: {sorted(NETWORK_PERTURBATIONS)}")
    return NETWORK_PERTURBATIONS[key]
