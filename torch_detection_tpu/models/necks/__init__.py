from .fpn import FPN, PAFPN

__all__ = ["FPN", "PAFPN"]
