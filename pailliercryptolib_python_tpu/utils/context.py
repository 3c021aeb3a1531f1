"""Runtime context + hybrid-mode shims (reference parity layer).

The reference exposes QAT accelerator lifecycle and a QAT/CPU work-split
policy (py_ipclContext / py_ipclHybridControl / ipcl::HybridMode,
/root/reference/src/ipcl_python/bindings/include/ipcl_bindings.hpp:27-42,
ipcl_bindings.cpp:37-56).  On TPU the accelerator IS the default compute
path, so `context` becomes a device-selection shim (it reports whether an
accelerator backend is live) and `hybridMode` is accepted and recorded —
a host/TPU work split is a no-op policy knob for now.
"""

from __future__ import annotations

import enum


class hybridMode(enum.IntEnum):
    """Accelerator/CPU work-split ratios (values mirror ipcl::HybridMode)."""

    OPTIMAL = 0
    QAT = 1
    PREF_QAT90 = 2
    PREF_QAT80 = 3
    PREF_QAT70 = 4
    PREF_QAT60 = 5
    HALF = 6
    PREF_IPP60 = 7
    PREF_IPP70 = 8
    PREF_IPP80 = 9
    PREF_IPP90 = 10
    IPP = 11
    UNDEFINED = 12


# export_values() parity: enum members are reachable at module level too
OPTIMAL = hybridMode.OPTIMAL
QAT = hybridMode.QAT
HALF = hybridMode.HALF
IPP = hybridMode.IPP
UNDEFINED = hybridMode.UNDEFINED


class context:
    """Accelerator runtime lifecycle (py_ipclContext parity).

    `initializeContext("QAT")` in the reference spins up the QuickAssist
    runtime; here any accelerator choice maps onto the ambient JAX TPU
    backend (initialization is implicit in JAX), so these report state
    rather than mutate it.
    """

    _initialized = False
    _runtime_choice = None

    @staticmethod
    def initializeContext(runtime_choice: str) -> bool:
        context._initialized = True
        context._runtime_choice = runtime_choice
        return True

    @staticmethod
    def terminateContext() -> bool:
        context._initialized = False
        context._runtime_choice = None
        return True

    @staticmethod
    def isQATRunning() -> bool:
        """True when an accelerator (TPU) backend is live and initialized."""
        if not context._initialized:
            return False
        try:
            import jax
            return any(d.platform != "cpu" for d in jax.devices())
        except Exception:
            return False

    @staticmethod
    def isQATActive() -> bool:
        return context.isQATRunning()


class hybridControl:
    """Work-split policy shim (py_ipclHybridControl parity)."""

    _mode = hybridMode.UNDEFINED

    @staticmethod
    def setHybridMode(mode: hybridMode) -> None:
        hybridControl._mode = hybridMode(mode)

    @staticmethod
    def setHybridOff() -> None:
        hybridControl._mode = hybridMode.IPP

    @staticmethod
    def getHybridMode() -> hybridMode:
        return hybridControl._mode
