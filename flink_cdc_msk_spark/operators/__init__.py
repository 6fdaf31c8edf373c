from .route import route_mongo_cdc, route_mysql_cdc

__all__ = ["route_mysql_cdc", "route_mongo_cdc"]
