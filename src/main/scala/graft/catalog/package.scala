package graft

/** Catalog layer: versioned Parquet tables with optimistic commits —
  * Spark-native stand-in for the reference's Iceberg+Nessie deployment. */
package object catalog
