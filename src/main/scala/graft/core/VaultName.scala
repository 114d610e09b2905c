package graft.core

/**
 * A vault is a namespaced dataset `namespace.relation`.
 *
 * Validation mirrors the reference's regex
 * `^([a-zA-Z_][a-zA-Z0-9_]*)[.]([a-zA-Z_][a-zA-Z0-9_]*$)`
 * (`cmd/vaults/commands.go:32`, parsed at `:774-785`).
 */
final case class VaultName(namespace: String, relation: String) {
  override def toString: String = s"$namespace.$relation"
}

object VaultName {
  private val Pattern = "^([a-zA-Z_][a-zA-Z0-9_]*)[.]([a-zA-Z_][a-zA-Z0-9_]*)$".r

  def parse(s: String): Either[String, VaultName] = s match {
    case Pattern(ns, rel) => Right(VaultName(ns, rel))
    case _ => Left(s"invalid vault name: '$s' (expected namespace.relation)")
  }

  def unsafe(s: String): VaultName =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}

/**
 * Account: Ethereum-style hex address owning vaults
 * (reference `internal/app/models.go:18-35`).
 */
final case class Account(address: String) {
  require(Account.isValid(address), s"invalid account address: $address")
}

object Account {
  private val Hex = "^0x[0-9a-fA-F]{40}$".r
  def isValid(s: String): Boolean = Hex.matches(s)
  def parse(s: String): Either[String, Account] =
    if (isValid(s)) Right(Account(s)) else Left(s"invalid account address: $s")
}
