"""Class-based hubness-reduction surface (reference API parity).

The reference resolves ``Kiez(hubness=...)`` through a class resolver
that accepts a name, a class, or an instance
(/root/reference/kiez/kiez.py:103,129 ``HintOrType[HubnessReduction]``
+ ``hubness_reduction_resolver``; classes in
``kiez/hubness_reduction/__init__.py``). These lightweight marker
classes reproduce that calling convention:

    from kiezray.hubness import CSLS, LocalScaling
    Kiez(hubness=CSLS())
    Kiez(hubness=LocalScaling(method="nicdm"))
    Kiez(hubness=DisSimLocal(squared=False))

Execution stays in the vectorized kernels of ``kiezray.rerank``; an
instance only carries the method name and kwargs.
"""

from __future__ import annotations


class HubnessReduction:
    """Base marker; subclasses set ``method`` (a kiezray.rerank name)."""

    method: str = "none"

    def __init__(self, **kwargs):
        self.kwargs = dict(kwargs)
        self.kwargs.pop("nn_algo", None)  # reference wiring detail


class NoHubnessReduction(HubnessReduction):
    method = "none"


class CSLS(HubnessReduction):
    method = "csls"


class LocalScaling(HubnessReduction):
    """kwargs: method='standard'|'ls'|'nicdm' (reference local_scaling.py)."""

    method = "ls"


class MutualProximity(HubnessReduction):
    """kwargs: method='normal'|'empiric' (reference mutual_proximity.py)."""

    method = "mp_normal"


class DisSimLocal(HubnessReduction):
    """kwargs: squared=bool (reference dis_sim.py:44-61)."""

    method = "dsl"
