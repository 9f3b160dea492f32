"""Model zoo: NNPs and Hamiltonian predictors as jit-compiled flax modules."""

from nabladft_tpu.models.base import (  # noqa: F401
    MODEL_REGISTRY,
    create_model,
    forward,
    register_model,
)
from nabladft_tpu.models.dimenetpp import DimeNetPP  # noqa: F401
from nabladft_tpu.models.gemnet_oc import GemNetOC  # noqa: F401
from nabladft_tpu.models.equiformer_v2 import EquiformerV2  # noqa: F401
from nabladft_tpu.models.escn import ESCN  # noqa: F401
from nabladft_tpu.models.graphormer3d import Graphormer3D  # noqa: F401
from nabladft_tpu.models.painn import PaiNN  # noqa: F401
from nabladft_tpu.models.phisnet import PhiSNet  # noqa: F401
from nabladft_tpu.models.qhnet import QHNet  # noqa: F401
from nabladft_tpu.models.schnet import SchNet  # noqa: F401
