from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.formats.base import Tensor  # noqa: F401
from tt_sketch_tpu.formats.cp import CPTensor  # noqa: F401
from tt_sketch_tpu.formats.dense import DenseTensor  # noqa: F401
from tt_sketch_tpu.formats.sparse import SparseTensor  # noqa: F401
from tt_sketch_tpu.formats.tensor_sum import TensorSum  # noqa: F401
from tt_sketch_tpu.formats.tensor_train import TensorTrain  # noqa: F401
from tt_sketch_tpu.formats.tucker import TuckerTensor  # noqa: F401
