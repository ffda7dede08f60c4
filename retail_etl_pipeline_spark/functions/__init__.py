"""Shared column expressions used across operators."""

from .weeks import yr_wk_num
from .metrics import decimal_sum, money, money_sum, safe_div

__all__ = ["yr_wk_num", "decimal_sum", "money", "money_sum", "safe_div"]
