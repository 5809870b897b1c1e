"""The shipped BaseKeOpsTestCase applied to the fused-kernel trio (reference:
test/kernels/keops/ — RBF/Matérn/periodic KeOps kernels asserted equal to the plain
kernels)."""

import gpytorch_tpu.kernels as K
import gpytorch_tpu.kernels.keops as keops
from gpytorch_tpu.testing import BaseKeOpsTestCase


class TestKeOpsRBF(BaseKeOpsTestCase):
    k1 = K.RBFKernel
    k2 = keops.RBFKernel


class TestKeOpsMatern05(BaseKeOpsTestCase):
    k1 = K.MaternKernel
    k2 = keops.MaternKernel
    kernel_kwargs = {"nu": 0.5}


class TestKeOpsMatern25(BaseKeOpsTestCase):
    k1 = K.MaternKernel
    k2 = keops.MaternKernel
    kernel_kwargs = {"nu": 2.5}


class TestKeOpsPeriodic(BaseKeOpsTestCase):
    k1 = K.PeriodicKernel
    k2 = keops.PeriodicKernel
