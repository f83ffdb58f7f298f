from .catalog import DeploymentCatalog

__all__ = ["DeploymentCatalog"]
