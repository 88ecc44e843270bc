from .star import denormalized_view, kpi_pack, top_n_by_revenue

__all__ = ["denormalized_view", "kpi_pack", "top_n_by_revenue"]
