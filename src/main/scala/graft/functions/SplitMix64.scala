package graft.functions

/** SplitMix64 avalanche (Steele, Lea & Flood, "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14 — public algorithm):
  * the one mixing core behind every deterministic pseudo-randomness
  * site in the engine (synthetic-corpus generation, multimodal payload
  * synthesis, LSH hyperplane components). Shared so a future change to
  * the mixing constants cannot silently diverge the sites — each
  * caller keeps its own input mapping (seed combination) and runs this
  * finalizer over it.
  */
object SplitMix64 {

  /** The golden-ratio increment callers add/multiply into their seed
    * combination before avalanching.
    */
  final val Gamma = 0x9E3779B97F4A7C15L

  /** The 3-step xor-shift-multiply avalanche. Pure, allocation-free. */
  def avalanche(zIn: Long): Long = {
    var z = (zIn ^ (zIn >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
