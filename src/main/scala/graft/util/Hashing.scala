package graft.util

/** Shared deterministic mixing primitives for the native expressions
  * (no stored state, identical on any cluster/JVM). */
object Hashing {
  /** SplitMix64 finalizer (Steele et al., public domain constant set). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
