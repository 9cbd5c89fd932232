package graft.apdb

/** Test-side lock for the SESSION-GLOBAL SQL view names
  * (`dia_object_last` etc.): `ApdbSpark.registerViews` binds them on
  * the one shared SparkSession, and sbt runs suites in parallel — two
  * suites registering + querying the views concurrently would read
  * each other's warehouses. Every test that registers or reads the
  * views wraps that section in `SessionViews.synchronized`. */
object SessionViews
