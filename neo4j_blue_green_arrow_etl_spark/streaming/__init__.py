from .orchestrator import Orchestrator, OrchestratorStats

__all__ = ["Orchestrator", "OrchestratorStats"]
