"""Named query catalog modules. Importing a module registers its queries
into currency_etl_spark.catalog.CATALOG via the @register decorator."""
