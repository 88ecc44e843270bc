from .customers import clean_customers, customers_gold
from .products import clean_products, products_gold
from .pricing import clean_prices, pricing_gold
from .fact import clean_orders, daily_fact, monthly_rollup, incremental_fact_load

__all__ = [
    "clean_customers",
    "customers_gold",
    "clean_products",
    "products_gold",
    "clean_prices",
    "pricing_gold",
    "clean_orders",
    "daily_fact",
    "monthly_rollup",
    "incremental_fact_load",
]
