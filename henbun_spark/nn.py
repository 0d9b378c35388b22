"""Feed-forward encoder networks — the amortization ("projection") layer.

Reference: `/root/reference/Henbun/nn.py`. In the Spark engine the encoder
runs per Arrow batch inside the training pandas UDF: weights are global
parameters broadcast to executors, inputs are minibatch columns, outputs
feed LOCAL (per-row) variational parameters. Backprop through the network
comes from `henbun_spark.autodiff` (executed batch-wise, numpy-vectorized —
the Arrow + numpy path is the engine's "vectorized execution").

Weight polymorphism (`nn.py:36-54`): each layer's weights may be plain
`Variable`s or `Variational`s (Bayesian NN) — pass ``variable_types``.
"""

from __future__ import annotations

from henbun_spark import autodiff as ad
from henbun_spark.param import Parameterized, Variable, graph_key
from henbun_spark.utils import clip


class MatBias(Parameterized):
    """Affine layer ``clip(x @ w + b)`` (`nn.py:10-32`)."""

    def __init__(
        self,
        nodes,
        n_layers=[],
        mean=0.0,
        stddev=1.0,
        variable=Variable,
        collections=None,
    ):
        assert len(nodes) == 2
        Parameterized.__init__(self)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        self.w = variable(
            shape=[nodes[0], nodes[1]],
            n_layers=n_layers,
            mean=mean,
            stddev=stddev,
            collections=collections,
        )
        self.b = variable(
            shape=[1, nodes[1]],
            n_layers=n_layers,
            mean=mean,
            stddev=stddev,
            collections=collections,
        )

    def __call__(self, x):
        w = object.__getattribute__(self, "w").tensor()
        b = object.__getattribute__(self, "b").tensor()
        return clip((x @ w) + b)


_NEURON_TYPES = {
    "sigmoid": ad.sigmoid,
    "tanh": ad.tanh,
    "relu": ad.relu,
    "softplus": ad.softplus,
}


class NeuralNet(Parameterized):
    """MLP: chained MatBias with per-layer activations; **no activation
    after the final layer** (`nn.py:34-87`).

    ``neuron_types``: a callable (autodiff unary op), the name of one
    ('sigmoid' default, 'relu', 'tanh', 'softplus'), or a list per layer.
    """

    def __init__(
        self,
        nodes,
        n_layers=[],
        mean=0.0,
        stddev=1.0,
        variable_types=Variable,
        neuron_types="sigmoid",
        collections=None,
    ):
        Parameterized.__init__(self)
        self.nodes = nodes
        if not isinstance(variable_types, list):
            variable_types = [variable_types for _ in range(len(nodes) - 1)]
        if not isinstance(neuron_types, list):
            neuron_types = [neuron_types for _ in range(len(nodes) - 2)]
        self.neuron_types = [
            _NEURON_TYPES[t] if isinstance(t, str) else t for t in neuron_types
        ]
        self._matbias_list = []
        for i in range(len(nodes) - 1):
            matbias = MatBias(
                nodes=[nodes[i], nodes[i + 1]],
                n_layers=n_layers,
                mean=mean,
                stddev=stddev,
                variable=variable_types[i],
                collections=collections,
            )
            self._matbias_list.append(matbias)
            setattr(self, "matbias" + str(i), matbias)

    def __call__(self, x):
        y = x if isinstance(x, ad.Tensor) else ad.Tensor(x)
        for i in range(len(self.nodes) - 2):
            y = self.neuron_types[i](self._matbias_list[i](y))
        return self._matbias_list[-1](y)

    def __getitem__(self, i):
        return self._matbias_list[i]
