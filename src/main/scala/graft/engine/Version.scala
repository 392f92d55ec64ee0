package graft.engine

/** Engine version surface (SURVEY §2 S4/C12; reference
  * `risingwave/core.py:40-59` parses `RisingWave-x.y.z` from `version()` —
  * here the engine IS the library, so the constant is authoritative). */
object Version {
  val major = 0
  val minor = 1
  val patch = 0
  val string = s"graft-$major.$minor.$patch-spark"
}
