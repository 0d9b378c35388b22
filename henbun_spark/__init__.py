"""henbun_spark — a PySpark-native variational-inference analytics engine.

A from-scratch rebuild of the capabilities of fujii-team/Henbun
(a TensorFlow variational Bayesian inference library, see
/root/reference/README.md:6-21) on idiomatic Apache Spark:

* global parameters  -> driver-held numpy arrays, broadcast per step
* local  parameters  -> DataFrame columns produced by encoder networks
* data               -> DataFrames (Parquet sources)
* objective          -> per-row loss computed in Arrow-batched pandas UDFs
                        with a tiny pure-numpy reverse-mode autodiff
* training           -> mapInPandas partial gradients -> driver Adam

On top of the inference core, `henbun_spark.operators` adds the
relational / large-scale training-data-pipeline surface (dedup,
similarity search, text analysis, multimodal plumbing) expressed
Catalyst-first (built-in Column functions, broadcast joins, LSH
bucket joins) so plans scale to 100 TB clusters.
"""

from henbun_spark import config as _config

settings = _config.settings
temp_settings = _config.temp_settings

from henbun_spark import transforms, densities, priors, utils  # noqa: E402
from henbun_spark.param import Variable, Data, MinibatchData, Parameterized, ParamList, graph_key  # noqa: E402
from henbun_spark.model import Model, Optimizer, AutoOptimize, Adam, GradientDescent, Indexer  # noqa: E402
from henbun_spark import variationals  # noqa: E402
from henbun_spark import nn  # noqa: E402
from henbun_spark import gp  # noqa: E402

__version__ = "0.1.0"
