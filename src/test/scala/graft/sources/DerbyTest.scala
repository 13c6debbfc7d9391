package graft.sources

import java.nio.file.Files

/** Shared embedded-Derby fixture for the JDBC specs. `derby.system.home`
  * is set ONCE, before the engine's first boot in this JVM (the property
  * is only read at boot), so derby.log deterministically lands in a temp
  * dir instead of the repo working tree regardless of which spec runs
  * first.
  */
object DerbyTest {
  private val home = {
    val dir = Files.createTempDirectory("graft-derby-home").toString
    System.setProperty("derby.system.home", dir)
    dir
  }

  /** A fresh single-use database URL under the shared Derby home. */
  def url(name: String): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/$name;create=true".ensuring(_ => home.nonEmpty)
  }
}
