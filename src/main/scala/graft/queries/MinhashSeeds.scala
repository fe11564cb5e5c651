package graft.queries

/** Fixed minhash permutation keys: `md5(i).hex[:15]` as a 60-bit int
  * for i = 0..23. Hard-coded (not computed at runtime) so the DuckDB
  * oracle can inline the identical literals; xor with a fixed key is
  * an order-scrambling bijection, which is all a minhash permutation
  * needs. 24 keys cover the largest data-scaled banding tier
  * (4 bands × 6 rows); the fixed-banding demos keep using the first
  * 8 (2 × 4), so their literals are unchanged.
  */
object MinhashSeeds {
  val keys: Seq[Long] = Seq(
    935853755618645598L, 886263699231969848L, 901255563090117366L,
    1066434503623691823L, 758855882668719729L, 1030659900335514164L,
    101208472399937786L, 644382284193898855L, 909462732443060921L,
    314206118826137595L, 954081726591288357L, 455193227907869294L,
    873888875930359669L, 887717380339419664L, 768763379948702757L,
    702334801939933494L, 897581348089946711L, 508623027732940896L,
    501186190269383009L, 139862117541546036L, 688790641950333260L,
    271796801708262658L, 823444586919548370L, 249549349976540318L)
}
