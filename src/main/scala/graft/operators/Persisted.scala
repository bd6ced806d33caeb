package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared persistence policy for derived index frames (signatures,
  * pair graphs, per-doc feature tables): MEMORY_AND_DISK, once per
  * canonicalized plan. `Dataset.storageLevel` consults the session
  * CacheManager by canonicalized plan, so the guard makes repeat
  * calls no-ops instead of `CacheManager: Asked to cache already
  * cached data` warnings — repeat builders of the same frame (every
  * catalog query that touches the signature index) share ONE cache
  * entry silently. At warehouse scale these frames are materialized
  * tables; session-level persistence gives the same
  * computed-once property. */
object Persisted {
  def index(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else df.persist(StorageLevel.MEMORY_AND_DISK)
}
