from projet_etl_spark.sources.tables import (  # noqa: F401
    load_table,
    points_de_vente,
    produits,
)
