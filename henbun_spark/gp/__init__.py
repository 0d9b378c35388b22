from henbun_spark.gp import kernels
from henbun_spark.gp.gp import GP, SparseGP
